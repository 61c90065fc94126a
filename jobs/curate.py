#!/usr/bin/env python
"""End-to-end training-corpus curation job — the composition a
100 TB data pipeline actually ships, built entirely from the engine's
operators:

  1. c4 clean   (--c4-line-delim) C4 line-level cleaning: rewrite text
                to surviving lines, drop under-the-line-minimum docs
  2. pii scrub  (default on) redact emails/SSNs/phones/IPv4 in place
                before anything downstream can memorize them
  3. score      language-ID, quality, token counts   (codegen exprs)
  4. gate       lang == --lang, quality >= --min-quality,
                token count in [--min-tokens, --max-tokens]; with
                --doc-gates also the document-level Gopher rules
                (alpha fraction, stop-word minimum, bullet/ellipsis)
  5. repetition gate  Gopher/C4 rules (duplicate lines, top/dup n-gram
                ratios, symbol density) via gopher_quality().keep
  6. exact dedup  md5 fingerprint keeper per group    (short-key shuffle)
  7. near dedup   MinHash-LSH candidates → Jaccard on candidates →
                  connected components → keeper anti-join
  8. corpus dedup  (--dedup-against) incremental-ingestion check: drop
                batch docs near-dupping the standing corpus (banded
                minhash index + Jaccard confirm on candidates only)
  9. decontaminate  (--holdout) drop docs sharing any winnowing
                fingerprint with the holdout/eval corpus
 10. dsir       (--dsir-target/--dsir-k) DSIR importance resampling:
                keep k docs ∝ exp(hashed-bigram log-importance toward
                the target corpus), Gumbel top-k, fully deterministic
 11. mix        (--mix src=w,...) per-source target proportions with
                temperature (--mix-temperature) and optional doc
                budget (--mix-budget): deterministic salted-bucket
                acceptance per source, unlisted sources dropped
 12. write      curated parquet + one JSON line of funnel stats; with
                --shard-size, fixed-size training shards instead
                (md5 permutation, dense seq_id, partitionBy shard)

Near-dedup keeper policy: min doc_id by default; --keep-best keeps the
longest member of each cluster.

Every stage is a DataFrame transform; the only shuffles are the
fingerprint key, the (band, minhash) key, the candidate equi-joins and
the cluster rounds — nothing quadratic, nothing collected.

Usage:
  spark-submit --py-files dist/watermark_detector_spark.zip \
    jobs/curate.py --docs <documents.parquet> --out <dir> \
    [--lang en] [--min-quality 0.5] [--min-tokens 20] [--max-tokens 5000] \
    [--jaccard 0.5] [--no-repetition-gate] [--holdout <holdout.parquet>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def curate(spark, docs, lang: str = "en", min_quality: float = 0.5,
           min_tokens: int = 20, max_tokens: int = 5000,
           jaccard: float = 0.5, out: str | None = None,
           repetition_gate: bool = True, holdout=None,
           pii_scrub: bool = True, c4_line_delim: str | None = None,
           doc_gates: bool = False, span_dedup_n: int | None = None,
           lm_nll_max: float | None = None, lm_vocab: int = 4096,
           near_keep: str = "min_id", dsir_target=None,
           dsir_k: int | None = None, shard_size: int | None = None,
           dedup_against=None, dedup_sigs_path: str | None = None,
           mix: dict[str, float] | None = None,
           mix_temperature: float = 1.0, mix_budget: int | None = None):
    """(curated DataFrame, funnel stats dict). Deterministic keeper
    rule at every stage: min doc_id survives — unless
    ``near_keep="best"``, which keeps the longest member of each
    near-dup cluster instead (dedup_drops_best). ``dsir_target`` +
    ``dsir_k`` add a DSIR importance-resampling selection toward the
    target corpus as the final stage; ``shard_size`` writes the output
    as fixed-size training shards (shard_assign + partitionBy).

    Materialization discipline (this lineage is re-read by the funnel
    counts, three shingle scans inside near-dup, the anti-join, AND the
    final write — unpersisted it would recompute the gate+hash stages
    ~7x): the exact-dedup stage is persisted for the duration of the
    run, and the curated output is materialized exactly once — written
    to ``out`` and read back when a path is given (the production
    shape: counts come from the sink, never a second pipeline run), or
    localCheckpoint'ed at fixture scale."""
    # argument validation BEFORE any Spark job runs — a bad combo must
    # not cost a full pipeline execution first
    if near_keep not in ("min_id", "best"):
        raise ValueError(
            f"near_keep must be 'min_id' or 'best', got {near_keep!r}")
    if (dsir_target is None) != (not dsir_k):
        raise ValueError(
            "dsir_target and dsir_k must be given together "
            f"(got target={'set' if dsir_target is not None else None}, "
            f"k={dsir_k!r})")
    if mix is not None:
        # reuse the operator's own checks BEFORE the pipeline runs — a
        # bad mix spec must not cost the full gate+dedup execution
        if not mix or any(w <= 0 for w in mix.values()):
            raise ValueError(f"mix needs positive source weights, got {mix}")
        if mix_temperature <= 0:
            raise ValueError(
                f"mix_temperature must be > 0, got {mix_temperature}")
        if mix_budget is not None and mix_budget <= 0:
            raise ValueError(f"mix_budget must be > 0, got {mix_budget}")

    from watermark_detector_spark.functions.text import (
        fingerprint,
        lang_guess,
        quality_score,
        token_count,
    )
    from watermark_detector_spark.operators.dedup import (
        dedup_keepers,
        near_dup_pairs,
    )

    stats = {"input": docs.count()}

    # the rewrite stages below each need a count over their output AND
    # feed the downstream lineage — persist once so neither the stat
    # counts nor the scoring pass re-run the scan+join (the
    # materialize-once contract in the module docstring)
    staged = None
    if c4_line_delim is not None:
        # C4 line cleaning (opt-in; pass the corpus line delimiter):
        # rewrite text to the surviving lines, drop docs below the
        # line minimum — a scan-side projection, zero shuffle
        from watermark_detector_spark.functions.text import c4_clean

        cleaned = c4_clean(docs, line_delim=c4_line_delim,
                           require_terminal_punct=False)
        docs = (docs.drop("text")
                .join(cleaned.where("keep")
                      .select("doc_id", F.col("clean_text").alias("text")),
                      "doc_id")).persist()
        staged = docs
        stats["after_c4_clean"] = docs.count()

    if pii_scrub:
        # redact emails/SSNs/phones/IPv4 in place BEFORE anything
        # downstream can memorize or fingerprint them; a rewrite, not
        # a filter (doc count unchanged — scrubbed doc count recorded)
        from watermark_detector_spark.functions.pii import (
            PII_PATTERNS,
            pii_count,
            scrub_col,
        )

        if staged is None:
            docs = docs.persist()
            staged = docs
        n_pii = None
        for k, _, _ in PII_PATTERNS:
            c = pii_count(F.col("text"), k)
            n_pii = c if n_pii is None else n_pii + c
        stats["pii_docs_scrubbed"] = docs.where(n_pii > 0).count()
        docs = docs.withColumn("text", scrub_col(F.col("text")))

    if span_dedup_n is not None:
        # cross-document exact span dedup (opt-in; rewrite, not a
        # filter): duplicated n-line spans are removed from every
        # occurrence but the first and the doc text rebuilt — AFTER the
        # PII scrub (spans must hash the redacted text) and BEFORE the
        # gates (quality scores the deduplicated text)
        from watermark_detector_spark.operators.dedup import exact_span_dedup

        rebuilt = exact_span_dedup(docs, n=span_dedup_n,
                                   line_delim=c4_line_delim or "\n")
        prev = staged
        joined = (docs.drop("text")
                  .join(rebuilt.select(
                      "doc_id", F.col("text_clean").alias("text"),
                      "n_lines_removed"), "doc_id")).persist()
        stats["span_dedup_docs_rewritten"] = joined.where(
            F.col("n_lines_removed") > 0).count()
        docs = joined.drop("n_lines_removed")
        staged = joined
        if prev is not None:
            prev.unpersist()

    scored = docs.select(
        "*",
        lang_guess(F.col("text")).alias("_lang"),
        quality_score(F.col("text")).alias("_quality"),
        token_count(F.col("text")).alias("_n_tokens"),
    )
    gate_cond = (
        (F.col("_lang") == lang)
        & (F.col("_quality") >= min_quality)
        & F.col("_n_tokens").between(min_tokens, max_tokens)
    )
    if doc_gates:
        # document-level Gopher gates (alpha fraction, stop-word
        # minimum, bullet/ellipsis ratios) — inline boolean column,
        # same scan, no join; word bounds already covered by
        # min/max_tokens above so they are left wide open here
        from watermark_detector_spark.functions.text import gopher_gates_keep

        gate_cond = gate_cond & gopher_gates_keep(
            F.col("text"), line_delim=c4_line_delim or "\n",
            min_words=1, max_words=1 << 60)
    gated = scored.where(gate_cond).persist()
    stats["after_gate"] = gated.count()
    if staged is not None:
        staged.unpersist()

    if repetition_gate:
        # Gopher/C4 repetition & boilerplate rules: keep-flag semi-join on
        # the doc key (metrics live in their own aggregation lineage, so
        # the wide text column never rides the n-gram shuffles)
        from watermark_detector_spark.functions.text import gopher_quality

        keep_ids = gopher_quality(gated).where("keep").select("doc_id")
        gated2 = gated.join(keep_ids, "doc_id", "left_semi").persist()
        stats["after_repetition_gate"] = gated2.count()
        gated.unpersist()
        gated = gated2

    if lm_nll_max is not None:
        # LM quality gate (CCNet-style, unigram edition): fit the LM on
        # the corpus that SURVIVED the rule gates (the same
        # self-reference CCNet's target-domain LM approximates), drop
        # docs whose mean NLL exceeds the threshold — gibberish and
        # boilerplate spam score high. Vocab is bounded + broadcast;
        # see functions/text.lm_quality and PLANS.md §q99.
        from watermark_detector_spark.functions.text import lm_quality

        lm_keep = (lm_quality(gated, gated, vocab_size=lm_vocab)
                   .where(F.col("avg_nll") <= lm_nll_max)
                   .select("doc_id"))
        gated_lm = gated.join(lm_keep, "doc_id", "left_semi").persist()
        stats["after_lm_gate"] = gated_lm.count()
        gated.unpersist()
        gated = gated_lm

    # exact dedup: one shuffle on the md5 key, min doc_id survives
    keyed = gated.withColumn("_fp", fingerprint(F.col("text")))
    keepers = keyed.groupBy("_fp").agg(F.min("doc_id").alias("_keeper"))
    exact = (
        keyed.join(keepers, "_fp")
        .where(F.col("doc_id") == F.col("_keeper"))
        .drop("_fp", "_keeper")
        .persist()
    )
    stats["after_exact_dedup"] = exact.count()
    gated.unpersist()

    # near dedup: LSH → Jaccard-on-candidates → components → drop non-keepers
    pairs = near_dup_pairs(exact, threshold=jaccard)
    if near_keep == "best":
        # keep-best policy: longest text survives each cluster
        from watermark_detector_spark.operators.dedup import dedup_drops_best

        dups = dedup_drops_best(
            exact.withColumn("_q", F.length("text")), pairs,
            quality_col="_q")
    else:  # "min_id" (validated at entry)
        dups = dedup_keepers(pairs).where(F.col("is_duplicate")) \
            .select(F.col("node").alias("doc_id"))
    curated = exact.join(dups, "doc_id", "left_anti") \
        .drop("_lang", "_quality", "_n_tokens")
    if dedup_against is not None:
        # incremental-ingestion dedup: drop batch docs near-dupping the
        # STANDING corpus. With --dedup-sigs the corpus signature index
        # is PERSISTED across invocations (computed + written on the
        # first run, read back on every later batch) so repeated ingest
        # runs never re-shingle the standing corpus — the production
        # shape; without it the index is derived inline per run.
        from watermark_detector_spark.operators.dedup import (
            incremental_near_dups,
            minhash_signatures,
        )

        corpus_sigs = None
        if dedup_sigs_path is not None:
            from watermark_detector_spark.streaming.sink import _HadoopFS

            # completeness gate is the _SUCCESS marker, not the dir: a
            # crashed first run leaves a partial directory that would
            # otherwise be silently accepted as the full index forever
            # (every later batch under-deduped); overwrite also clears
            # such leftovers on rebuild
            ok = os.path.join(dedup_sigs_path, "_SUCCESS")
            if not _HadoopFS(spark, dedup_sigs_path).exists(ok):
                minhash_signatures(dedup_against).write.mode(
                    "overwrite").parquet(dedup_sigs_path)
            corpus_sigs = spark.read.parquet(dedup_sigs_path)
        # `inc` stays referenced until after hit.count() materializes:
        # it carries the finalizer releasing the confirm stage's
        # candidate cache, and chaining would drop it pre-action
        inc = incremental_near_dups(curated, dedup_against,
                                    threshold=jaccard,
                                    corpus_sigs=corpus_sigs)
        hit = (inc.select(F.col("new_id").alias("doc_id")).distinct()
               .persist())
        n_corpus_dups = hit.count()
        del inc
        curated = curated.join(hit, "doc_id", "left_anti")
        stats["corpus_dups_dropped"] = n_corpus_dups
    if holdout is not None:
        # eval-set leakage gate: winnowing-fp semi-join (any shared
        # >=6-token run is caught), then anti-join on the flagged ids
        from watermark_detector_spark.operators.dedup import contaminated_ids

        # persist: the fingerprint+join lineage (the most expensive new
        # stage) would otherwise run twice — once for this count and
        # again when the anti-join materializes at write time
        flagged = contaminated_ids(curated, holdout).select("doc_id").persist()
        n_flagged = flagged.count()
        curated = curated.join(flagged, "doc_id", "left_anti")
    if dsir_target is not None and dsir_k:
        # DSIR selection: importance-weight survivors toward the target
        # corpus, keep a Gumbel top-k draw ∝ exp(log_w). Deterministic
        # (pure md5), so re-runs select the same k docs.
        from watermark_detector_spark.operators.sampling import (
            dsir_log_weights,
            importance_resample,
        )

        pre_dsir = curated.persist()  # weighed AND semi-joined below
        n_pre_dsir = pre_dsir.count()
        w = dsir_log_weights(pre_dsir, dsir_target)
        sel = importance_resample(w, dsir_k).select("doc_id")
        curated = pre_dsir.join(sel, "doc_id")
    if mix is not None:
        # final assembly: per-source target proportions (temperature-
        # adjusted), deterministic salted-bucket acceptance — sources
        # not listed in the mix are dropped
        from watermark_detector_spark.operators.sampling import corpus_mix

        pre_mix = curated.persist()  # counted here AND filtered below
        n_pre_mix = pre_mix.count()
        curated = corpus_mix(pre_mix, mix, temperature=mix_temperature,
                             budget=mix_budget)
    if out is not None:
        if shard_size:
            # training-export layout: md5-permute + dense ids + fixed
            # shards; each output partition is one contiguous slice of
            # the global permutation, sorted by seq_id so two runs
            # write byte-identical shard files (repartition alone
            # leaves shuffle-fetch order nondeterministic)
            from watermark_detector_spark.operators.ids import shard_assign

            sharded = shard_assign(curated, shard_size)
            if sharded.isEmpty():
                # partitionBy on an empty frame writes no data file and
                # the read-back below cannot infer a schema — write a
                # plain (schema-carrying) empty parquet instead
                sharded.write.mode("overwrite").parquet(out)
            else:
                (sharded.repartition("shard_id")
                 .sortWithinPartitions("seq_id")
                 .write.mode("overwrite")
                 .partitionBy("shard_id").parquet(out))
        else:
            curated.write.mode("overwrite").parquet(out)
        curated = spark.read.parquet(out)
    else:
        curated = curated.localCheckpoint(eager=True)
    exact.unpersist()
    if holdout is not None:
        flagged.unpersist()
    if dedup_against is not None:
        hit.unpersist()
    final = curated.count()
    dsir_on = dsir_target is not None and dsir_k
    mix_on = mix is not None
    post_mix_in = n_pre_mix if mix_on else final  # count entering mix
    post_decon = n_pre_dsir if dsir_on else post_mix_in
    # after_near_dedup = the count right after the BATCH near-dedup,
    # i.e. before the corpus-dup, holdout and dsir drops
    post_near = post_decon + (
        n_corpus_dups if dedup_against is not None else 0)
    if holdout is not None:
        post_near += n_flagged
        stats["decontaminated"] = n_flagged
    stats["after_near_dedup"] = post_near
    if dsir_on:
        stats["after_dsir"] = post_mix_in
        pre_dsir.unpersist()
    if mix_on:
        stats["after_mix"] = final
        pre_mix.unpersist()
    if out is not None and shard_size:
        # seq_id is dense 0..final-1 by construction — no extra scan
        stats["n_shards"] = -(-final // shard_size)
    stats["dropped_total"] = stats["input"] - final
    return curated, stats


def main() -> None:  # pragma: no cover - CLI wrapper
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=5000)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--no-repetition-gate", action="store_true",
                    help="skip the Gopher/C4 repetition rules stage")
    ap.add_argument("--holdout", default=None,
                    help="parquet of eval/holdout docs (doc_id, text); "
                         "curated docs sharing any winnowing fingerprint "
                         "with it are dropped")
    ap.add_argument("--no-pii-scrub", action="store_true",
                    help="skip the email/SSN/phone/IPv4 redaction stage")
    ap.add_argument("--c4-line-delim", default=None,
                    help="enable the C4 line-cleaning stage with this "
                         "line delimiter (e.g. $'\\n')")
    ap.add_argument("--doc-gates", action="store_true",
                    help="apply the document-level Gopher gates (alpha "
                         "fraction, stop-word minimum, bullet/ellipsis)")
    ap.add_argument("--span-dedup-n", type=int, default=None,
                    help="cross-document exact span dedup: remove "
                         "duplicated runs of N lines (first occurrence "
                         "kept, docs rebuilt)")
    ap.add_argument("--lm-nll-max", type=float, default=None,
                    help="LM quality gate: drop docs whose mean "
                         "negative log likelihood under a unigram LM "
                         "fit on the gated corpus exceeds this")
    ap.add_argument("--lm-vocab", type=int, default=4096,
                    help="vocabulary size for the --lm-nll-max LM")
    ap.add_argument("--keep-best", action="store_true",
                    help="near-dedup keeps the longest cluster member "
                         "instead of the smallest doc_id")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of target-domain docs (doc_id, text); "
                         "enables DSIR importance resampling toward it")
    ap.add_argument("--dsir-k", type=int, default=None,
                    help="number of docs the DSIR stage keeps")
    ap.add_argument("--shard-size", type=int, default=None,
                    help="write fixed-size training shards (md5 "
                         "permutation + dense seq_id + partitionBy)")
    ap.add_argument("--dedup-against", default=None,
                    help="parquet of the standing corpus (doc_id, "
                         "text); batch docs near-dupping it are "
                         "dropped (incremental-ingestion dedup)")
    ap.add_argument("--dedup-sigs", default=None,
                    help="parquet path caching the --dedup-against "
                         "corpus minhash signature index: written on "
                         "the first run, read back on every later "
                         "batch so repeated ingest runs never "
                         "re-shingle the standing corpus")
    ap.add_argument("--mix", default=None,
                    help="corpus mixing: comma list of source=weight "
                         "(e.g. src0=0.5,src1=0.3,src2=0.2); unlisted "
                         "sources are dropped")
    ap.add_argument("--mix-temperature", type=float, default=1.0,
                    help="mixing temperature: p ~ w^(1/T); T>1 "
                         "flattens toward uniform")
    ap.add_argument("--mix-budget", type=int, default=None,
                    help="target doc count for the mix (default: "
                         "largest feasible preserving the ratios)")
    args = ap.parse_args()
    if args.dedup_sigs and not args.dedup_against:
        ap.error("--dedup-sigs requires --dedup-against")
    mix = None
    if args.mix:
        try:
            mix = {s: float(w) for s, w in
                   (kv.split("=", 1) for kv in args.mix.split(","))}
        except ValueError as e:
            ap.error(f"--mix expects source=weight[,source=weight...]: {e}")

    from watermark_detector_spark.session import get_spark

    spark = get_spark(app_name="wmd-curate")
    _, stats = curate(
        spark, spark.read.parquet(args.docs), lang=args.lang,
        min_quality=args.min_quality, min_tokens=args.min_tokens,
        max_tokens=args.max_tokens, jaccard=args.jaccard, out=args.out,
        repetition_gate=not args.no_repetition_gate,
        holdout=(spark.read.parquet(args.holdout)
                 if args.holdout else None),
        pii_scrub=not args.no_pii_scrub,
        c4_line_delim=args.c4_line_delim,
        doc_gates=args.doc_gates,
        span_dedup_n=args.span_dedup_n,
        lm_nll_max=args.lm_nll_max, lm_vocab=args.lm_vocab,
        near_keep="best" if args.keep_best else "min_id",
        dsir_target=(spark.read.parquet(args.dsir_target)
                     if args.dsir_target else None),
        dsir_k=args.dsir_k, shard_size=args.shard_size,
        dedup_against=(spark.read.parquet(args.dedup_against)
                       if args.dedup_against else None),
        dedup_sigs_path=args.dedup_sigs,
        mix=mix, mix_temperature=args.mix_temperature,
        mix_budget=args.mix_budget,
    )
    print(json.dumps({"out": args.out, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
