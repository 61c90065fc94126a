"""Text-analysis column builders for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All pure built-in column expressions (JVM-side, codegen'd, no UDF) so
they run at full scan speed over 100 TB — these are per-document
derivations that should never leave WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: split on word/number/punct boundaries —
    a regex approximation of subword tokenizers' pre-tokenization."""
    return F.size(
        F.split(F.trim(text), r"(?<=\W)|(?=\W)|(?<=\d)(?=\D)|(?<=\D)(?=\d)")
    ).cast("bigint")


def _count_occurrences(padded: Column, needle: str) -> Column:
    """#occurrences of `needle` via length arithmetic — pure codegen,
    no regex engine in the loop."""
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("bigint")


def stopword_hits(text: Column, word: str = "the") -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return _count_occurrences(padded, f" {word} ")


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[.,;:!?'\"()\[\]]", "")
    return F.round(
        (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1)), 4
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: stopword density + length
    band + punctuation sanity (the text analog of the reference's
    confidence scoring)."""
    n_tok = token_count(text)
    stop_ratio = stopword_hits(text) / F.greatest(n_tok, F.lit(1))
    len_ok = F.when((n_tok >= 20) & (n_tok <= 5000), 1.0).otherwise(0.5)
    return F.round(
        F.least(F.lit(1.0), (stop_ratio * 4 + 0.2) * len_ok), 4
    )


def lang_guess(text: Column) -> Column:
    """Marker-word language ID: argmax over per-language stopword hits.
    (n-gram heuristic; tiny marker sets keep it codegen-only)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = {
        "en": _count_occurrences(padded, " the "),
        "es": _count_occurrences(padded, " el "),
        "de": _count_occurrences(padded, " der "),
        "fr": _count_occurrences(padded, " le "),
        "pt": _count_occurrences(padded, " os "),
    }
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    # reverse order => earlier languages win ties (deterministic)
    for lang in reversed(list(hits)):
        guess = F.when(hits[lang] == best, F.lit(lang)).otherwise(guess)
    return F.when(best > 0, guess).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the UTF-8 bytes (exact-dup key)."""
    return F.md5(text.cast("binary"))


def prefix_fingerprint(text: Column, n_tokens: int = 5) -> Column:
    """Head fingerprint: first-n-token key (catches boilerplate-headed
    duplicates that exact hashing misses)."""
    return F.array_join(F.slice(tokens_col(text), 1, n_tokens), " ")


try:  # Python UDTF (pyspark >= 3.5): table-valued chunker
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_tokens int")
    class ChunkText:
        """Fixed-size token chunking with overlap — the LLM-corpus
        window operator (context-length packing). One doc row expands
        to ceil(n_tok / step) chunk rows of ``chunk_tokens`` tokens,
        consecutive chunks overlapping by chunk_tokens - step. Register
        with ``spark.udtf.register`` and call via LATERAL; fan-out is
        oracle-checked (driver query q54)."""

        def eval(self, text: str, chunk_tokens: int, step: int):
            # reachable straight from SQL (LATERAL wmd_chunk_text(t, 32, 0));
            # step <= 0 would loop the executor task forever — raise instead
            if chunk_tokens is None or chunk_tokens < 1:
                raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
            if step is None or step < 1:
                raise ValueError(f"step must be >= 1, got {step}")
            if text is None:
                return
            toks = text.split()
            i, s = 0, 0
            while s < len(toks):
                part = toks[s:s + chunk_tokens]
                yield (i, " ".join(part), len(part))
                i += 1
                s += step

    HAS_UDTF = True
except ImportError:  # pragma: no cover - pyspark < 3.5
    HAS_UDTF = False
