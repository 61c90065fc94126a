"""Page sources — batch parquet, file-stream replay, and an Iceberg hook.

At design scale the input is an Iceberg table of Common-Crawl-style
pages (BASELINE.json). The sandbox has no Iceberg jar, so the Iceberg
reader is gated behind an import/availability check with identical
downstream semantics; the file-stream source replays the same rows in
deterministic micro-batches (mtime-ordered files + maxFilesPerTrigger),
which is what the streaming tests and bench use.

Replaces the reference's sorted-directory scans (train_watermarks.py:38-40,
generate_dataset.py:177-178): determinism comes from keys, not listing order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import PAGES_SCHEMA


def read_pages_batch(spark: SparkSession, path: str, glob: str | None = None,
                     recursive: bool = False) -> DataFrame:
    """Batch scan. ``glob`` filters files by name (``pathGlobFilter``,
    e.g. '*.parquet') — the engine analog of the reference's
    extension-filtered directory scans (train_watermarks.py:38-40);
    ``recursive`` descends nested dirs (``recursiveFileLookup``)."""
    # explicit schema: no inference pass over 100 TB of files
    reader = spark.read.schema(PAGES_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.parquet(path)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1,
    glob: str | None = None,
) -> DataFrame:
    """File-stream replay of a pages directory; one file == one
    micro-batch when ``max_files_per_trigger=1`` (mtime order).
    ``glob`` filters which files enter the stream (``pathGlobFilter``)."""
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def read_pages_iceberg(spark: SparkSession, table: str, streaming: bool = True) -> DataFrame:
    """Iceberg source (production path). Requires iceberg-spark-runtime on
    the classpath; raises a clear error in environments without it."""
    try:
        if streaming:
            return (
                spark.readStream.format("iceberg")
                .option("streaming-skip-delete-snapshots", "true")
                .load(table)
            )
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # pragma: no cover - sandbox has no Iceberg jar
        raise RuntimeError(
            "Iceberg source unavailable (iceberg-spark-runtime jar not on "
            "classpath). Use read_pages_stream/read_pages_batch instead."
        ) from e
