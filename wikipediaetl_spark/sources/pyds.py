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
files named by the sanitized ``name`` column (separators stripped so an
untrusted title cannot escape the landing directory), via temp-file +
rename so partial writes are never visible. Used by tests only; the
engine's durable sink remains parquet.
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


def _sizes(paths: List[str]) -> Iterator[tuple]:
    """(path, size) for files that still exist — a landing directory is
    drained/archived concurrently (sources/maintenance.py), so files may
    vanish between listing and stat; skip them instead of failing the scan
    (same tolerance as _WikiHtmlStreamReader._rows)."""
    for p in paths:
        try:
            yield p, os.path.getsize(p)
        except FileNotFoundError:
            continue


def _plan_splits(paths: List[str], target_bytes: int) -> List[_FileSplit]:
    """Pack (path, size) into byte-balanced splits, largest-first so one huge
    file doesn't drag a split far past target. Deterministic given the same
    listing (sorted by size desc then path)."""
    sized = sorted(_sizes(paths), key=lambda t: (-t[1], t[0]))
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
            try:
                st = os.stat(p)
                with open(p, "r", encoding="utf-8", errors="replace") as fh:
                    content = fh.read()
            except FileNotFoundError:
                continue  # drained/archived between planning and read
            yield (p, st.st_size, int(st.st_mtime), content)


@dataclass
class _WriteDone(WriterCommitMessage):
    files: List[str]


def _safe_name(name) -> str:
    """Sanitize an untrusted page title into a bare filename: path
    separators become '_' (the reference fetcher's save_html_to_local does
    the same before writing, WikipediaCrawler/fetcher/app/main.py), NULs are
    dropped, and names that would resolve to a directory ('', '.', '..')
    are rejected. Result contains no os.sep, so os.path.join cannot escape
    the landing directory and an absolute name cannot discard it."""
    base = str(name).replace("/", "_").replace("\\", "_").replace("\x00", "")
    if base in ("", ".", ".."):
        raise ValueError(f"wikihtml: unwritable page name {name!r}")
    return base


class _WikiHtmlWriter(DataSourceWriter):
    """One file per row, named by the (sanitized) ``name`` column (reference
    landing-sink shape). Tasks write independently — no shuffle, no driver
    funnel. Each file is written to a per-attempt temp name and renamed into
    place only when its content is fully on disk, so a task that dies
    mid-write never leaves a partial page a subsequent wikihtml scan would
    treat as committed; ``abort`` deletes this attempt's renamed files (from
    the commit messages) and sweeps its temp leftovers."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikihtml: .save(path) is required")
        import uuid

        # one token per write job: every task of this attempt shares it (the
        # writer is pickled to executors), so abort can identify leftovers
        # without touching files from other concurrent writers.
        self.token = uuid.uuid4().hex[:12]

    def write(self, rows) -> _WriteDone:
        os.makedirs(self.path, exist_ok=True)
        root = os.path.realpath(self.path)
        done: List[str] = []
        for row in rows:
            base = _safe_name(row["name"])
            target = os.path.join(self.path, base)
            # belt-and-suspenders: refuse if the target (e.g. via a
            # pre-existing symlink named `base`) resolves outside the root
            if os.path.realpath(target) != os.path.join(root, base):
                raise ValueError(f"wikihtml: {base!r} escapes the landing dir")
            tmp = os.path.join(self.path, f".{base}.tmp-{self.token}")
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(row["content"] or "")
            os.replace(tmp, target)
            done.append(base)
        return _WriteDone(files=done)

    def commit(self, messages):
        return None

    def abort(self, messages):
        # undo this attempt: files from tasks that committed (messages), plus
        # any temp leftovers carrying this attempt's token.
        for m in messages or []:
            for base in getattr(m, "files", None) or []:
                try:
                    os.remove(os.path.join(self.path, base))
                except FileNotFoundError:
                    pass
        try:
            for f in os.listdir(self.path):
                if f.endswith(f".tmp-{self.token}"):
                    try:
                        os.remove(os.path.join(self.path, f))
                    except FileNotFoundError:
                        pass
        except FileNotFoundError:
            pass


DEFAULT_MAX_BATCH_BYTES = 256 * 1024 * 1024


class _WikiHtmlStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the corpus scan: each micro-batch picks up pages
    that landed since the last committed offset — the reference's
    fetch-queue consumption loop (fetcher writes pages, ETL tasks poll,
    WikipediaCrawler/fetcher/app/main.py) as a registered readStream source.

    Offset = ``{"seen": {path: [mtime_ns, size]}}``: exactly-once per
    (path, mtime_ns, size) — a rewritten file (newer mtime OR changed size)
    is re-emitted, matching the crawler's re-fetch semantics, including
    rewrites that land within the same wall-clock second (nanosecond
    granularity; second-granularity mtimes silently missed those). Emitted
    rows carry the LISTING's stat, not a fresh one, so the row a batch
    emits and the offset it commits always agree; a file modified between
    listing and read emits the superseded content once and the new version
    in the next batch (at-least-once on rewrite races, never a gap).

    Driver-memory bound (explicit): ``read`` materializes the micro-batch's
    HTML on the driver (SimpleDataSourceStreamReader contract), so a batch
    is capped at ``max_batch_bytes`` (default 256 MiB) of listed file size;
    excess fresh files stay out of the committed offset and surface in
    subsequent batches. The offset JSON carries the full listing, which is
    fine for a landing directory that is drained and archived per batch
    (sources/formats.py archive_processed); an unbounded directory should
    compact the offset to a (archive-cutoff mtime, recent-files) pair."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wikihtml: .load(path) is required")
        self.suffix = options.get("suffix", ".html")
        self.max_batch_bytes = int(
            options.get("max_batch_bytes", DEFAULT_MAX_BATCH_BYTES)
        )

    def initialOffset(self) -> dict:
        return {"seen": {}}

    def _listing(self) -> dict:
        out = {}
        if os.path.isdir(self.path):
            for dirpath, _dirs, files in os.walk(self.path):
                for f in files:
                    if f.endswith(self.suffix):
                        p = os.path.join(dirpath, f)
                        try:
                            st = os.stat(p)
                        except FileNotFoundError:
                            continue  # raced with archival
                        out[p] = [st.st_mtime_ns, st.st_size]
        return out

    @staticmethod
    def _changed(seen: dict, now: dict) -> List[str]:
        # offsets survive a JSON checkpoint roundtrip, so compare as lists
        return sorted(p for p, meta in now.items() if list(seen.get(p) or ()) != meta)

    def _rows(self, meta: dict) -> Iterator[tuple]:
        for p in sorted(meta):
            mtime_ns, size = meta[p]
            try:
                with open(p, "r", encoding="utf-8", errors="replace") as fh:
                    content = fh.read()
            except FileNotFoundError:
                continue  # raced with archival; next listing won't have it
            yield (p, size, mtime_ns // 1_000_000_000, content)

    def read(self, start: dict):
        seen = start.get("seen", {})
        now = self._listing()
        fresh = self._changed(seen, now)
        taken: List[str] = []
        budget = self.max_batch_bytes
        for p in fresh:
            size = now[p][1]
            if taken and size > budget:
                break  # defer the rest; always take at least one file
            taken.append(p)
            budget -= size
        # advance only what this batch emits; keep deferred files at their
        # old (or absent) offset entry, drop entries for vanished files.
        end_seen = {p: meta for p, meta in seen.items() if p in now}
        for p in taken:
            end_seen[p] = now[p]
        batch = {p: now[p] for p in taken}
        return iter(list(self._rows(batch))), {"seen": end_seen}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        seen = start.get("seen", {})
        fresh = self._changed(seen, end.get("seen", {}))
        return self._rows({p: end["seen"][p] for p in fresh})

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
