"""Sequence packing — the training-batch assembly operator.

LLM pretraining concatenates documents into fixed-capacity token
sequences ("packing", e.g. GPT-3 / T5 pretraining input pipelines;
no reference analog — the reference stops at per-image samples,
generate_dataset.py:177-184, while a corpus engine must also hand the
trainer dense, fixed-shape batches). Semantics here are the standard
greedy first-fit-in-order rule, made DETERMINISTIC and engine-portable:

- every doc goes to shard ``doc_id % n_shards``;
- within a shard, docs are visited in doc_id order and appended to the
  current pack while the token total stays <= capacity; otherwise a new
  pack starts (a doc longer than capacity gets a pack of its own —
  oversize packs are flagged, not split, so the caller can route them
  to a chunker first);
- pack identity is (shard, pack_id) with pack_id dense from 0 per
  shard, and pack_pos the doc's position inside its pack.

Scale shape: the greedy scan is inherently sequential PER SHARD but
shards are independent, so parallelism = n_shards (pick >= cluster
cores; doc_id sharding keeps it deterministic). One shuffle on the
shard key; each task is a linear pandas pass over its shard. The
whole-corpus assignment is replayable in ANSI SQL as a linear
recursion (the q100 DuckDB oracle) — the assignment depends only on
(doc_id, token_count), never on partitioning or timing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from watermark_detector_spark.functions.text import token_count

_OUT_SCHEMA = ("doc_id long, shard long, pack_id long, pack_pos long, "
               "n_tokens long, pack_fill long, oversize boolean")


def pack_sequences(docs: DataFrame, capacity: int, n_shards: int = 256,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Assign every doc to a (shard, pack_id, pack_pos) training slot.

    Returns one row per doc: (doc_id, shard, pack_id, pack_pos,
    n_tokens, pack_fill, oversize) where pack_fill is the running token
    total of the pack AFTER this doc and oversize marks
    single-doc packs exceeding capacity."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    sized = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        (F.col(id_col).cast("long") % n_shards).alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_id, pack_pos, fill = [], [], []
        cur_id, cur_pos, cur_fill = -1, 0, 0
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if cur_id >= 0 and cur_fill + nt <= capacity:
                cur_pos += 1
                cur_fill += nt
            else:
                cur_id += 1
                cur_pos = 0
                cur_fill = nt
            pack_id.append(cur_id)
            pack_pos.append(cur_pos)
            fill.append(cur_fill)
        return pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "shard": pdf["shard"],
            "pack_id": pack_id,
            "pack_pos": pack_pos,
            "n_tokens": pdf["n_tokens"],
            "pack_fill": fill,
            "oversize": [n > capacity for n in pdf["n_tokens"]],
        })

    return sized.groupBy("shard").applyInPandas(_pack, _OUT_SCHEMA)
