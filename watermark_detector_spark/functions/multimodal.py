"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed
behind ``decoder=`` (default: a deterministic fake that derives stats
from the payload bytes — clearly marked; swap in cv2/PIL/ffmpeg on a
real cluster). Everything Spark-side is real and tested: schema,
batching, partitioning, UDF signatures — the same shape the reference
uses for images (bytes → numpy → features, generate_dataset.py:184,
train_watermarks.py:319).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, "
    "feature array<float>, ok boolean, error string"
)


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder (no codecs in this container): derives
    an 8-dim feature from the md5 of the payload bytes — md5 so a SQL
    oracle (DuckDB ``md5(text)``) can recompute feature values exactly.
    Feature i = digest byte i / 255 as float32. Replace with a real
    cv2/PIL/soundfile decode on a cluster with codecs installed."""
    if payload is None:
        raise ValueError("null payload")
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float32) / 255.0


def real_decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """The production decode hook. Not implementable in this sandbox."""
    raise NotImplementedError(
        "media decode requires cv2/PIL/ffmpeg — not present in this container"
    )


FRAME_SCHEMA = (
    "media_id string, frame_idx int, frame_ts_ms bigint, frame_fp string, ok boolean"
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling plumbing: one video row → one row per sampled
    frame at ``every_ms`` intervals (a mapInPandas row-expander — the
    UDTF shape). The DECODE is stubbed (no ffmpeg in this container):
    the frame fingerprint is md5(payload ':' idx) — deterministic AND
    SQL-recomputable, so the whole expander is oracle-checked (driver
    query q52). Real clusters swap the fingerprint for an actual frame
    grab; row fan-out, schema and batching are production-real."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "frame_idx", "frame_ts_ms", "frame_fp", "ok")}
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                n = 1 if dur is None or pd.isna(dur) else max(1, int(dur) // every_ms)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    if payload is None:
                        out["frame_fp"].append(None)
                        out["ok"].append(False)
                    else:
                        out["frame_fp"].append(
                            hashlib.md5(payload + b":" + str(i).encode()).hexdigest()
                        )
                        out["ok"].append(True)
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype="object"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int64"),
                "frame_fp": pd.Series(out["frame_fp"], dtype="object"),
                "ok": pd.Series(out["ok"], dtype="bool"),
            })

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        _proc, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id string, width int, height int, payload binary, ok boolean, error string"
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: per-image payload transform with target
    dimensions recorded in the typed metadata. The pixel op is stubbed
    (no cv2/PIL here): the fake 'resized' payload is a deterministic
    digest of (payload, w, h) — clearly marked; swap the inner lambda
    for cv2.resize on a real cluster. Error capture per row, same
    contract as extract_features (bad rows never kill the task)."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {"media_id": mid, "width": width, "height": height,
                       "payload": None, "ok": False, "error": None}
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    # FAKE resize (no codecs): digest stands in for pixels
                    row["payload"] = hashlib.blake2b(
                        payload + f":{width}x{height}".encode(), digest_size=32
                    ).digest()
                    row["ok"] = True
                except Exception as e:
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            pdf_out = pd.DataFrame(
                out, columns=["media_id", "width", "height",
                              "payload", "ok", "error"])
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            yield pdf_out

    return media.select("media_id", "payload").mapInPandas(
        _proc, schema=RESIZED_SCHEMA
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media table → per-item feature vectors via mapInPandas.

    Partition-parallel, Arrow-batched; failures are captured per row
    (ok/error columns) instead of failing the task — at 100 TB a few
    corrupt payloads must never kill a 10-hour job."""

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                row = {
                    "media_id": mid,
                    "kind": kind,
                    "n_bytes": len(payload) if payload is not None else 0,
                    "feature": None,
                    "ok": False,
                    "error": None,
                }
                try:
                    row["feature"] = [float(x) for x in decoder(payload, kind)]
                    row["ok"] = True
                except Exception as e:  # capture, don't kill the task
                    row["error"] = f"{type(e).__name__}: {e}"
                out.append(row)
            yield pd.DataFrame(out)

    return media.mapInPandas(_proc, schema=FEATURE_SCHEMA)
