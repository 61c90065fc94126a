"""WARC-style page container as a custom Python DataSource (Spark 4
DataSource API): `spark.read.format("warcish")` /
`df.write.format("warcish")` over a directory of record-framed binary
files — the Common-Crawl-shaped ingestion path when pages arrive as
archive containers rather than parquet.

Container format (deterministic, streamable, one file = one work unit,
mirroring WARC's record framing — reference analog: the directory-of-
image-files source, generate_dataset.py's per-file records):

    WARCISH/1\n
    url: <url>\n
    ts: <microseconds since epoch, decimal>\n
    lang: <tag>\n
    len: <payload byte length, decimal>\n
    \n
    <payload bytes>\n

Scale posture: `partitions()` returns ONE InputPartition per container
file — at 10^12 docs the file inventory IS the parallelism, exactly as
with Spark's native FileScan; executors open only their own file, the
driver never reads payload bytes. `pushFilters` accepts equality
filters on the METADATA fields (url/lang) so filtered scans skip
payload materialization per record — the custom-source version of
predicate pushdown (the remaining filters are left for Spark to
re-apply, per the API contract).

Streaming replay of page directories stays on sources/pages.py (native
parquet file source, exactly-once tracked by Spark); this source covers
the archive-container ingest + egress path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MAGIC = b"WARCISH/1"

SCHEMA_DDL = "url string, warc_ts timestamp, lang string, html binary"


def write_records(path: str, records) -> int:
    """Append-write an iterable of (url, ts_us, lang, payload_bytes)
    records into one container file; returns the record count."""
    n = 0
    with open(path, "wb") as fh:
        for url, ts_us, lang, payload in records:
            payload = payload if payload is not None else b""
            fh.write(MAGIC + b"\n")
            fh.write(b"url: " + str(url).encode() + b"\n")
            fh.write(b"ts: " + str(int(ts_us)).encode() + b"\n")
            fh.write(b"lang: " + str(lang).encode() + b"\n")
            fh.write(b"len: " + str(len(payload)).encode() + b"\n\n")
            fh.write(payload + b"\n")
            n += 1
    return n


def read_records(path: str) -> Iterator[tuple]:
    """Parse one container file -> (url, ts_us, lang, payload)."""
    with open(path, "rb") as fh:
        while True:
            magic = fh.readline()
            if not magic:
                return
            if magic.rstrip(b"\n") != MAGIC:
                raise ValueError(
                    f"{path}: bad record magic {magic!r} — corrupt "
                    "container or not a warcish file")
            hdr = {}
            while True:
                ln = fh.readline()
                if ln in (b"\n", b""):
                    break
                k, _, v = ln.rstrip(b"\n").partition(b": ")
                hdr[k.decode()] = v.decode()
            n = int(hdr["len"])
            payload = fh.read(n)
            fh.read(1)  # trailing newline
            yield hdr["url"], int(hdr["ts"]), hdr.get("lang", ""), payload


@dataclass
class _FilePartition(InputPartition):
    path: str


class WarcishReader(DataSourceReader):
    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warcish: .load(path) is required")
        self.eq_filters: dict[str, str] = {}

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept equality filters on metadata fields (url, lang): the
        reader then drops records before materializing payload bytes
        into Arrow. Everything else is returned as unsupported and
        Spark re-applies it above the scan (safe by contract)."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (("url",), ("lang",)):
                self.eq_filters[f.attribute[0]] = f.value
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        files = sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".warcish")
        )
        if not files:
            raise ValueError(f"warcish: no .warcish files under {self.dir}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        want = self.eq_filters
        for url, ts_us, lang, payload in read_records(partition.path):
            if "url" in want and url != want["url"]:
                continue
            if "lang" in want and lang != want["lang"]:
                continue
            yield (
                url,
                datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
                .replace(tzinfo=None),
                lang,
                payload,
            )


class WarcishStreamReader(DataSourceStreamReader):
    """Micro-batch streaming over a growing directory of container
    files. Offsets are positions in the LEXICOGRAPHIC file order —
    container files are immutable once written and named monotonically
    by convention (part-..., or any sortable scheme), so `latestOffset`
    is a single directory listing and each micro-batch plans one
    InputPartition per NEW file (same work-unit shape as the batch
    reader; executors open only their own file). Offsets live in the
    checkpoint WAL, so restart resumes exactly after the last committed
    file — replay of a committed batch re-reads the same file set,
    which is what exactly-once sinks downstream dedup on."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warcish: .load(path) is required")

    def _files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".warcish"))

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"last": ""}

    def latestOffset(self) -> dict:  # noqa: N802 (API name)
        files = self._files()
        return {"last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        # offsets are file NAMES (a lexicographic high-watermark), not
        # list indices: a straggler file sorting below the consumed
        # watermark can never shift other files' positions and corrupt
        # replay — it is skipped, exactly like an event below an
        # event-time watermark. Producer contract: streamed-in files
        # must carry monotonically increasing names (timestamped or
        # sequence-numbered, the norm for archive drops); the batch
        # writer's uuid-suffixed parts do NOT guarantee this across
        # separate append writes — use explicit names when producing
        # for a stream.
        return [
            _FilePartition(os.path.join(self.dir, f))
            for f in self._files()
            if start["last"] < f <= end["last"]
        ]

    def read(self, partition: _FilePartition):
        for url, ts_us, lang, payload in read_records(partition.path):
            yield (
                url,
                datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
                .replace(tzinfo=None),
                lang,
                payload,
            )

    def commit(self, end: dict) -> None:
        # nothing to clean: files are immutable, offsets live in the
        # streaming checkpoint
        pass


@dataclass
class _WriteDone(WriterCommitMessage):
    path: str
    rows: int


class WarcishWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("warcish: .save(path) is required")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.dir, exist_ok=True)
        # unique suffix: append mode must never clobber an existing
        # part file that happens to share a partition id
        path = os.path.join(
            self.dir, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.warcish")
        n = write_records(
            path,
            ((r.url,
              # naive datetime -> UTC micros (symmetric with the
              # reader's UTC->naive, so values round-trip regardless
              # of the session timezone)
              int(r.warc_ts.replace(tzinfo=timezone.utc).timestamp() * 1e6)
              if hasattr(r.warc_ts, "timestamp") else int(r.warc_ts),
              r.lang, bytes(r.html) if r.html is not None else b"")
             for r in iterator),
        )
        return _WriteDone(path=path, rows=n)

    def commit(self, messages):
        # one-file-per-task + driver-side commit marker: same
        # all-or-nothing publication shape as the exactly-once sink
        with open(os.path.join(self.dir, "_SUCCESS"), "w") as fh:
            fh.write("\n".join(f"{m.path}\t{m.rows}" for m in messages))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class WarcishDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(WarcishDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warcish"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> WarcishReader:
        return WarcishReader(self.options)

    def streamReader(self, schema: StructType) -> WarcishStreamReader:  # noqa: N802
        return WarcishStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> WarcishWriter:
        # overwrite semantics resolve HERE, on the driver, before any
        # task runs: stale container files from a previous (possibly
        # wider-partitioned) write would otherwise survive under their
        # old part numbers and silently duplicate rows on read
        path = self.options.get("path")
        if overwrite and path and os.path.isdir(path):
            for f in os.listdir(path):
                if f.endswith(".warcish") or f == "_SUCCESS":
                    os.remove(os.path.join(path, f))
        return WarcishWriter(self.options, overwrite)
