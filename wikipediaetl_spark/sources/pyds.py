"""Spark 4 Python DataSource: the wholetext-HTML corpus as a registered format.

``spark.read.format("wikihtml").load(dir)`` scans a directory of HTML pages
into ``(path, length, mtime, content)`` rows — the same corpus shape the
reference's task loop reads file-by-file (fetcher writes one HTML file per
page, ETL/tasks/categorizer.py:131 and ETL/tasks/converter.py:52 re-read
them). Unlike ``read_wholetext`` (sources/tables.py:73), this is a
first-class V2 source with its own partition planner, so it composes with
everything ``spark.read`` gives: schema projection, ``.filter`` on metadata
columns, multi-task parallel scan.

Scale posture: partition planning is file-list driven — files are packed
into roughly equal-byte splits (``target_bytes`` option, default 32 MiB),
so one giant directory becomes N balanced tasks instead of one task per
file (small-file storm) or one task total (no parallelism). Each task opens
only its own files; the driver holds just the (path, size) listing, which
for 100 TB of ~100 KB pages is ~1e9 entries — at that point point the
listing itself should come from a manifest table, so ``load`` also accepts
a glob pattern to shard the listing externally.

The write path (``mode="overwrite"`` unsupported — append-only) mirrors the
reference's one-file-per-page landing sink (fetcher/app/main.py writes
``<title>.html``): each task writes its partition's rows as individual
files named by the ``name`` column. Used by tests only; the engine's durable
sink remains parquet.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("length", LongType(), False),
        StructField("mtime", LongType(), False),
        StructField("content", StringType(), True),
    ]
)

DEFAULT_TARGET_BYTES = 32 * 1024 * 1024


@dataclass
class _FileSplit(InputPartition):
    files: List[str]


def _plan_splits(paths: List[str], target_bytes: int) -> List[_FileSplit]:
    """Pack (path, size) into byte-balanced splits, largest-first so one huge
    file doesn't drag a split far past target. Deterministic given the same
    listing (sorted by size desc then path)."""
    sized = sorted(
        ((p, os.path.getsize(p)) for p in paths),
        key=lambda t: (-t[1], t[0]),
    )
    splits: List[List[str]] = []
    loads: List[int] = []
    for p, sz in sized:
        # first-fit onto the lightest split still under target, else new split
        idx = min(range(len(loads)), key=loads.__getitem__) if loads else -1
        if idx >= 0 and loads[idx] + sz <= target_bytes:
            splits[idx].append(p)
            loads[idx] += sz
        else:
            splits.append([p])
            loads.append(sz)
    return [_FileSplit(files=s) for s in splits] or [_FileSplit(files=[])]


class _WikiHtmlReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikihtml: .load(path) is required")
        self.suffix = options.get("suffix", ".html")
        self.target_bytes = int(options.get("target_bytes", DEFAULT_TARGET_BYTES))

    def partitions(self) -> List[InputPartition]:
        root = self.path
        paths: List[str] = []
        if os.path.isdir(root):
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if f.endswith(self.suffix):
                        paths.append(os.path.join(dirpath, f))
        elif os.path.isfile(root):
            paths = [root]
        else:
            import glob

            paths = [p for p in glob.glob(root) if p.endswith(self.suffix)]
        return _plan_splits(paths, self.target_bytes)

    def read(self, partition: _FileSplit) -> Iterator[tuple]:
        for p in sorted(partition.files):
            st = os.stat(p)
            with open(p, "r", encoding="utf-8", errors="replace") as fh:
                content = fh.read()
            yield (p, st.st_size, int(st.st_mtime), content)


@dataclass
class _WriteDone(WriterCommitMessage):
    files: int


class _WikiHtmlWriter(DataSourceWriter):
    """One file per row, named by the ``name`` column (reference landing-sink
    shape). Tasks write independently — no shuffle, no driver funnel."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikihtml: .save(path) is required")

    def write(self, rows) -> _WriteDone:
        os.makedirs(self.path, exist_ok=True)
        n = 0
        for row in rows:
            name = row["name"]
            with open(os.path.join(self.path, name), "w", encoding="utf-8") as fh:
                fh.write(row["content"] or "")
            n += 1
        return _WriteDone(files=n)

    def commit(self, messages):
        return None

    def abort(self, messages):
        return None


class _WikiHtmlStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the corpus scan: each micro-batch picks up pages
    that landed since the last committed offset — the reference's
    fetch-queue consumption loop (fetcher writes pages, ETL tasks poll,
    WikipediaCrawler/fetcher/app/main.py) as a registered readStream source.

    Offset = ``{"seen": {path: mtime}}``: exactly-once per (path, mtime) —
    a rewritten file (newer mtime) is re-emitted, matching the crawler's
    re-fetch semantics. The offset JSON carries the full listing, which is
    fine for a landing directory that is drained and archived per batch
    (sources/formats.py archive_processed); an unbounded directory should
    compact the offset to a (archive-cutoff mtime, recent-files) pair."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikihtml: .load(path) is required")
        self.suffix = options.get("suffix", ".html")

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def _listing(self) -> dict:
        out = {}
        if os.path.isdir(self.path):
            for dirpath, _dirs, files in os.walk(self.path):
                for f in files:
                    if f.endswith(self.suffix):
                        p = os.path.join(dirpath, f)
                        out[p] = int(os.stat(p).st_mtime)
        return out

    def _rows(self, paths) -> Iterator[tuple]:
        for p in sorted(paths):
            try:
                st = os.stat(p)
                with open(p, "r", encoding="utf-8", errors="replace") as fh:
                    content = fh.read()
            except FileNotFoundError:
                continue  # raced with archival; next listing won't have it
            yield (p, st.st_size, int(st.st_mtime), content)

    def read(self, start: dict):
        seen = start.get("seen", {})
        now = self._listing()
        fresh = [p for p, mt in now.items() if seen.get(p) != mt]
        end = {"seen": now}
        return iter(list(self._rows(fresh))), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = start.get("seen", {})
        fresh = [p for p, mt in end.get("seen", {}).items() if seen.get(p) != mt]
        return self._rows(fresh)

    def commit(self, end: dict) -> None:
        return None


class WikiHtmlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wikihtml"

    def schema(self):
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WikiHtmlReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError("wikihtml sink is append-only (landing directory)")
        return _WikiHtmlWriter(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _WikiHtmlStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('wikihtml')`` afterwards."""
    spark.dataSource.register(WikiHtmlDataSource)
