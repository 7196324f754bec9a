"""Stored bucketed layout — the exchange-elimination lever for repeated
fact-fact and star joins (VERDICT r2 #2).

A shuffle (Exchange) on the join key is the dominant cost of q11/q12-shaped
queries once scans are pruned: DuckDB's single-node radix join keeps the
whole probe in RAM, while Spark pays a full hash-partition write+read per
query. Bucketing moves that shuffle OFFLINE: write the fact table once as a
bucketed+sorted table on its join key, and every subsequent join on that key
reads co-located buckets — SortMergeJoin with NO Exchange on either side
(zipPartitions over pre-sorted buckets).

At 100 TB this is the difference between re-shuffling ~100 TB per query and
never shuffling it again: the layout cost is paid once at ingest (the write
itself shuffles into buckets), then every orderkey join — q12's
lineitem⋈orders, TPC-H Q3/Q4/Q12/Q18/Q21 shapes, the categorizer's bridge
joins (ETL/tasks/categorizer.py:178-187 scaled) — rides it. Bucket count is
a layout-time decision: pick ≥ cluster cores and ≤ target file count
(buckets × partitions files are written); 32 here to match local[32].

Spark specifics encoded by these helpers:
- bucketed tables must be saved via ``saveAsTable`` (bucket metadata lives
  in the catalog, not in parquet footers);
- both sides must be bucketed with the SAME bucket count on the join key,
  and ``spark.sql.sources.bucketing.enabled`` (default true) honors it;
- ``sortBy`` on the bucket key lets SMJ skip the per-task sort too;
- a bucketed scan produces exactly ``n_buckets`` tasks — for huge tables
  raise ``spark.sql.sources.bucketing.maxBuckets`` and use more buckets.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import query
from wikipediaetl_spark.sources import load_table


# Table property marking a staging table as a COMPLETED merge (safe to
# rename into place). Set after saveAsTable finishes, before the main table
# is dropped — see merge_batch_into_rollup's crash-recovery contract.
_COMMIT_PROP = "wikipediaetl.rollup.committed"
_BATCH_PROP = "wikipediaetl.rollup.lastBatchId"
_PENDING_PROP = "wikipediaetl.append.pendingBatchId"


def _show_tblproperties(spark: SparkSession, table: str):
    """``SHOW TBLPROPERTIES`` rows, or None iff the table does not exist.

    Only the table-not-found analysis error is treated as "absent"; any
    OTHER catalog/metastore failure propagates (ADVICE r10 low: the old
    catch-all turned a transient metastore error during
    ``recover_interrupted_swap`` into "staging uncommitted" — which DROPS a
    committed staging holding the full maintained history — and the same
    failure in the replay gate returned None and silently disabled replay
    suppression, allowing double-appends). Recovery must fail LOUD on
    unexpected errors, never destroy state on them."""
    from pyspark.errors import AnalysisException

    try:
        return spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    except AnalysisException as e:
        cls = getattr(e, "getErrorClass", lambda: None)() or ""
        if "TABLE_OR_VIEW_NOT_FOUND" in cls or "TABLE_OR_VIEW_NOT_FOUND" in str(e):
            return None
        raise


def _staging_committed(spark: SparkSession, staging: str) -> bool:
    """True iff ``staging`` carries the commit marker, i.e. its contents are
    a complete merge (not a partial first-ever write that crashed
    mid-saveAsTable). Raises on unexpected catalog errors — see
    ``_show_tblproperties``."""
    rows = _show_tblproperties(spark, staging)
    if rows is None:
        return False
    return any(r["key"] == _COMMIT_PROP and r["value"] == "true" for r in rows)


def _table_prop_int(spark: SparkSession, table: str, prop: str) -> int | None:
    """An integer TBLPROPERTY of ``table``, or None if the table or the
    property is absent. Raises on unexpected catalog errors."""
    rows = _show_tblproperties(spark, table)
    if rows is None:
        return None
    for r in rows:
        if r["key"] == prop:
            try:
                return int(r["value"])
            except ValueError:
                return None
    return None


def _table_batch_id(spark: SparkSession, table: str) -> int | None:
    """The replay watermark stamped into ``table``'s TBLPROPERTIES by a
    previous merge, or None for an unstamped/missing table. The property
    rides the staging table through RENAME, so the watermark survives every
    crash window — including the one ADVICE r8 flagged, where a crash
    between drop and rename is recovered by auto-renaming a committed
    staging that ALREADY contains batch N: the renamed table carries
    lastBatchId=N, so a replay of batch N is skipped, not double-counted.
    Raises on unexpected catalog errors (ADVICE r10 low) — a swallowed
    metastore failure here would silently disable replay suppression."""
    rows = _show_tblproperties(spark, table)
    if rows is None:
        return None
    for r in rows:
        if r["key"] == _BATCH_PROP:
            try:
                return int(r["value"])
            except ValueError:
                return None
    return None


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` via the Hadoop FileSystem API, resolving
    the filesystem from the path's own scheme (file:, hdfs:, s3a:, …), so
    staging/emptied-partition cleanup works on any shared FS a real cluster
    would use — a driver-local ``shutil.rmtree`` silently no-ops on
    non-POSIX schemes and the temp dirs accumulate forever (ADVICE r8).
    Best-effort like the rmtree it replaces: cleanup failure must never
    fail a merge whose data commit already succeeded."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception:
        # last-ditch local fallback (e.g. a mocked session in tests)
        shutil.rmtree(path.removeprefix("file:"), ignore_errors=True)


def _drop_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its warehouse location. A location orphaned
    by a previous session (catalog entry gone, directory still on disk)
    makes saveAsTable fail with LOCATION_ALREADY_EXISTS — remove it too
    (scheme-aware: the warehouse may live on a shared non-POSIX FS)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        wh = spark.conf.get("spark.sql.warehouse.dir")
        _hadoop_delete(spark, f"{wh}/{table}")
    except Exception:
        pass


def recover_interrupted_swap(
    spark: SparkSession, table: str, partition_cols: tuple[str, ...] = ()
) -> None:
    """Interrupted-swap recovery, factored out of ``staged_swap_write`` so
    callers that READ the maintained table (or bootstrap it when absent)
    can recover FIRST (ADVICE r9 high/medium: ``cluster_ledger_sink``
    bootstrapped an EMPTY ledger inside the drop→rename crash window —
    table absent, committed staging holding the full history — and the
    empty table then masked the recovery branch and let the merge destroy
    the staging; ``merge_pairs_into_cluster_ledger`` raised instead of
    recovering). The cases: main table absent + staging COMMITTED ⟹ a
    completed previous merge crashed between drop and rename — finish the
    rename; main absent + staging UNcommitted ⟹ a first-ever build crashed
    mid-``saveAsTable`` — drop the partial staging (the main table never
    existed, so nothing is lost). Idempotent; a no-op when the main table
    exists."""
    staging = f"{table}_staging"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(staging):
        if _staging_committed(spark, staging):
            spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
            if partition_cols:
                spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
        else:
            _drop_table(spark, staging)


def maintained_layout_sink(
    spark: SparkSession,
    apply_batch,
    recover_tables=(),
    bootstrap=None,
    bootstrap_table: str | None = None,
):
    """The ONE foreachBatch maintenance skeleton every maintained layout's
    streaming entry point delegates to (VERDICT r10 #4): all six sinks —
    cluster ledger, exact-dedup ledger, BM25 postings, IVF cells, decontam
    postings, DSIR histograms, plus the curation capstone — repeat the same
    three-step shape, and the ADVICE r9 high bug was exactly one sink
    re-implementing it with the steps in the wrong order. Making the order
    structural means no FUTURE layout can get it wrong:

    1. RECOVER every maintained table first (``recover_interrupted_swap``)
       — BEFORE any existence check or read, because inside the drop→rename
       crash window the table is absent while a committed staging holds the
       full history; a bootstrap or read that runs first adopts an empty/
       stale view and the next merge destroys the staging (the exact r9
       failure). ``recover_tables`` entries are table names, or
       ``(name, partition_cols)`` for partitioned layouts (RECOVER
       PARTITIONS must run after the recovery rename or every scan resolves
       to the deleted staging paths).
    2. BOOTSTRAP once, only if ``bootstrap_table`` (default: the first
       recover table) is still absent AFTER recovery.
    3. APPLY the micro-batch: ``apply_batch(batch, batch_id)`` composes the
       replay-gated primitives (``append_batch_to_layout`` /
       ``merge_batch_into_keyed_rollup`` / ``staged_swap_write``), each of
       which stamps ``batch_id`` as its own watermark — so a redelivered
       batch no-ops per table, and a crash BETWEEN steps reconverges on
       redelivery (completed steps skip, remaining steps finish).

    The skeleton adds no state of its own; exactly-once-in-effect under
    foreachBatch's at-least-once delivery comes from the per-table
    watermarks, and batching-invariance from each layout's associative
    merge algebra (both property-tested per sink in tests/test_streaming)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        first: str | None = None
        for entry in recover_tables:
            name, pcols = entry if isinstance(entry, tuple) else (entry, ())
            if first is None:
                first = name
            recover_interrupted_swap(spark, name, pcols)
        target = bootstrap_table or first
        if bootstrap is not None and target is not None:
            if not spark.catalog.tableExists(target):
                bootstrap()
        apply_batch(batch, batch_id)

    return _sink


def bucketize(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table on
    ``key``. One shuffle now; zero shuffles for every later join/agg on
    ``key`` between tables sharing the bucket spec."""
    _drop_table(df.sparkSession, table)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketize_facts(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 32,
    prefix: str = "b_",
) -> dict[str, str]:
    """Materialize the standard join-heavy layout for the fixture schema:
    lineitem+orders bucketed on orderkey (fact-fact joins), orders+customer
    bucketed on custkey (star probes). Returns {role: table_name}.

    orders appears twice (two join keys → two layouts); at 100 TB you keep
    the one matching the dominant workload, or both if storage is cheaper
    than the recurring shuffle (it usually is — this is the same trade as a
    secondary index)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    tables = {
        "lineitem_by_orderkey": (li, "l_orderkey"),
        "orders_by_orderkey": (o, "o_orderkey"),
        "orders_by_custkey": (o, "o_custkey"),
        "customer_by_custkey": (c, "c_custkey"),
    }
    out = {}
    for role, (df, key) in tables.items():
        name = prefix + role
        bucketize(df, name, key, n_buckets=n_buckets)
        out[role] = name
    return out


def materialize_rollup(
    spark: SparkSession,
    sf_dir: str,
    table: str = "m_orders_by_custkey",
) -> None:
    """Materialized aggregate (summary/rollup table) — the layer ABOVE
    bucketing for star-schema dashboards: orders partially aggregated to the
    custkey grain (count + exact DECIMAL revenue), written once.

    A star query like q11 then reads |customers| rows instead of |orders|
    and re-aggregates to the asked grain — partial decimal sums merge
    associatively, so the final double is bit-identical to aggregating the
    raw fact table (asserted by tools/bench_bucketed.py). At 100 TB this is
    the standard cube/materialized-view trade: the rollup is maintained
    incrementally at ingest (each micro-batch appends its partial
    aggregates; a periodic compaction re-merges the grain), and every
    region/nation/segment dashboard query rides it instead of the fact
    scan. The grain column keeps FULL fidelity — any dimension join still
    works — only the additive measures are pre-combined."""
    from pyspark.sql import functions as F

    _drop_table(spark, table)
    o = load_table(spark, sf_dir, "orders")
    (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue_d"),
        )
        .write.mode("overwrite")
        .saveAsTable(table)
    )


def merge_batch_into_rollup(
    spark: SparkSession,
    batch: DataFrame,
    table: str = "m_orders_by_custkey",
    batch_id: int | None = None,
) -> None:
    """Incremental rollup maintenance: fold one ingest batch's partial
    aggregates into the stored summary table, idempotently.

    The batch is aggregated to the rollup grain (count + exact DECIMAL
    partial sums — associative, so merge order is irrelevant), unioned with
    the current table, re-merged per key, and swapped in via
    staging-write + drop + rename. The drop→rename pair is NOT a single
    atomic step, so two hazards are handled explicitly rather than assumed
    away: (1) a crash anywhere in the swap window leaves only the staging
    table — a COMMIT MARKER (table property set after the staging write
    completes, BEFORE the main table is dropped) distinguishes a completed
    merge awaiting rename (recovered by finishing the rename) from a
    partial staging write of a first-ever merge that crashed
    mid-``saveAsTable`` (dropped, so the merge restarts from the batch —
    the main table never existed, so nothing is lost); (2) a foreachBatch
    replay after a completed merge would double-count — so when
    ``batch_id`` is given it is stamped into every rollup row (constant
    ``last_batch_id`` column, atomic with the data it describes) and a
    replayed id ≤ the stored one is a no-op. An unstamped call
    (``batch_id=None``) on a stamped table CARRIES the stored
    ``last_batch_id`` forward rather than rebuilding without it — dropping
    it would silently discard the replay watermark and a later resumed
    stream would double-count its redelivered batch. Cost per batch is
    O(batch + |grain|), independent of the fact table's full history — the
    property that makes a 100 TB rollup maintainable. The streaming entry
    point is ``rollup_sink`` (a foreachBatch wrapper)."""
    from pyspark.sql import functions as F

    staging = f"{table}_staging"
    # Recover an interrupted swap: the staging table without the main table
    # is EITHER a completed previous merge caught between drop and rename
    # (commit marker present → finish the rename) OR a first-ever merge
    # that crashed mid-saveAsTable (no marker → the partial table must NOT
    # be adopted; drop it and merge from scratch — main never existed).
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(staging):
        if _staging_committed(spark, staging):
            spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        else:
            _drop_table(spark, staging)
    grain_cols = ["o_custkey", "n_orders", "revenue_d"]
    stored_batch_id: int | None = None
    if spark.catalog.tableExists(table):
        cur = spark.table(table)
        if "last_batch_id" in cur.columns:
            row = cur.select("last_batch_id").first()
            if row is not None and row[0] is not None:
                stored_batch_id = int(row[0])
    if batch_id is not None and stored_batch_id is not None and batch_id <= stored_batch_id:
        return  # replayed batch already folded into the rollup
    partial = batch.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue_d"),
    )
    if spark.catalog.tableExists(table):
        merged = (
            spark.table(table)
            .select(*grain_cols)
            .unionByName(partial)
            .groupBy("o_custkey")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("revenue_d").cast("decimal(18,2)").alias("revenue_d"),
            )
        )
    else:
        merged = partial
    # Stamp the new watermark; an unstamped call carries the stored one.
    stamp = batch_id if batch_id is not None else stored_batch_id
    if stamp is not None:
        merged = merged.withColumn("last_batch_id", F.lit(stamp).cast("long"))
    _drop_table(spark, staging)
    merged.write.mode("overwrite").saveAsTable(staging)
    # Commit point: marker set ⟹ staging holds a COMPLETE merge. Only after
    # this may the main table be dropped, so "main absent + staging without
    # marker" can only mean a partial first-ever write (handled above).
    spark.sql(
        f"ALTER TABLE {staging} SET TBLPROPERTIES ('{_COMMIT_PROP}'='true')"
    )
    _drop_table(spark, table)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


def rollup_sink(spark: SparkSession, table: str = "m_orders_by_custkey"):
    """foreachBatch sink maintaining the rollup from a stream of orders:
    ``stream.writeStream.foreachBatch(rollup_sink(spark)).start()``.
    Replays are idempotent: the micro-batch id is stamped into the rollup
    atomically with the merged data (see ``merge_batch_into_rollup``), so
    a redelivered batch after a completed merge is skipped, and an
    interrupted drop/rename swap is recovered from staging."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        merge_batch_into_rollup(spark, batch, table=table, batch_id=batch_id)

    return _sink


def create_partitioned_table(
    df: DataFrame,
    path: str,
    key: str,
    n_partitions: int = 64,
) -> None:
    """Write ``df`` as a hash-partitioned parquet warehouse table — the
    physical layout ``upsert_partitioned`` merges into.

    Rows land in ``_pkey = pmod(hash(key), n_partitions)`` directories, so
    any change batch touches a bounded, PRUNABLE set of directories. This is
    the storage layer the reference's ORM upsert mutates
    (ETL/tasks/categorizer.py:143-195 set-based insert/update against
    MySQL), re-expressed as immutable-file read-modify-write: at 100 TB a
    table-format (Delta/Iceberg) does the same thing with a manifest; plain
    partitioned parquet + dynamic partition overwrite is the
    dependency-free equivalent with directory-level granularity.
    ``n_partitions`` trades merge write amplification (rewrite = touched
    partitions) against file count / pruning fanout — at 100 TB pick
    thousands, here 64."""
    (
        df.withColumn("_pkey", F.pmod(F.hash(F.col(key)), F.lit(n_partitions)))
        .write.mode("overwrite")
        .partitionBy("_pkey")
        .parquet(path)
    )
    # The modulus is a LAYOUT INVARIANT every future merge must reuse —
    # recovering it from directory names is unsound (a sparse table may
    # leave high buckets empty), so pin it in a spec file next to the data
    # (the single-key analogue of a table-format's metadata file). The
    # schema rides along too: a zero-row table writes no parquet files at
    # all, so schema inference on read-back needs this fallback (the
    # empty-table-onboarding contract every operator honors).
    import json

    with open(f"{path.removeprefix('file:')}/_layout_spec.json", "w") as f:
        json.dump(
            {"key": key, "n_partitions": n_partitions, "schema": df.schema.json()},
            f,
        )


# Conf key selecting the durable staging-dir materialization for
# upsert_partitioned (VERDICT r7 #6). Default off: localCheckpoint is
# cheaper and fine on local[*]; ANY real cluster deployment should set it.
_DURABLE_CONF = "spark.wikipediaetl.upsert.durableStaging"


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    delete_keys: DataFrame | None = None,
    durable: bool | None = None,
) -> None:
    """Storage-level MERGE: fold ``changes`` (latest-wins per ``key``) and
    optional deletes into a ``create_partitioned_table`` layout, rewriting
    ONLY the partitions the change batch touches.

    Algorithm (exactly how Delta/Iceberg execute MERGE INTO, at directory
    rather than file granularity):
      1. tag each change/delete row with its ``_pkey``;
      2. the touched-partition id set is collected — BOUNDED by
         ``n_partitions`` (≤ a few thousand ints), never by data size;
      3. ONLY those partitions are read back (directory pruning — the scan
         never touches the unchanged 99% of a 100 TB table);
      4. base rows whose key appears in the batch are dropped via anti-join
         (AQE broadcasts the small batch side), survivors ∪ changes;
      5. the rewrite uses DYNAMIC partition overwrite, so untouched
         partitions' files are never rewritten (conf is set per-write and
         restored).
    Idempotent by construction: replaying the same batch yields the same
    partition contents. Latest-wins within a single batch must be resolved
    by the CALLER (changes must be unique per key — asserted cheaply on the
    batch, which is small); q158_upsert_snapshot is the query-level twin of
    these semantics and the round-trip test drives both against the same
    oracle."""
    base_any = _read_layout(spark, path)
    cols = [c for c in base_any.columns if c != "_pkey"]
    changes = changes.select(*cols)
    dup = changes.groupBy(key).count().filter(F.col("count") > 1).first()
    if dup is not None:
        raise ValueError(
            f"changes batch has {dup['count']} rows for {key}={dup[key]!r}; "
            "latest-wins within a batch must be resolved by the caller"
        )
    batch = changes.select(F.col(key).alias("_k"))
    if delete_keys is not None:
        batch = batch.unionByName(delete_keys.select(F.col(key).alias("_k")))
    spec = _read_spec(path)
    if spec["key"] != key:
        raise ValueError(f"layout at {path} is partitioned on {spec['key']!r}, not {key!r}")
    n_partitions = int(spec["n_partitions"])
    keyed = batch.withColumn("_pkey", F.pmod(F.hash(F.col("_k")), F.lit(n_partitions)))
    touched = [r._pkey for r in keyed.select("_pkey").distinct().collect()]  # bounded
    if not touched:
        return
    base = base_any.filter(F.col("_pkey").isin(touched))
    survivors = base.join(keyed.select(F.col("_k").alias(key)).distinct(), key, "left_anti")
    merged = survivors.select(*cols).unionByName(changes)
    if delete_keys is not None:
        merged = merged.join(
            delete_keys.select(F.col(key)).distinct(), key, "left_anti"
        )
    out = merged.withColumn("_pkey", F.pmod(F.hash(F.col(key)), F.lit(n_partitions)))
    # A partition touched ONLY by deletes can end up with zero rows; dynamic
    # overwrite skips partitions absent from the output, so its old files
    # would survive. Find emptied partitions (bounded set difference) and
    # drop their directories after the write — the granularity a
    # table-format handles via manifest tombstones.
    emptied: list[int] = []
    if delete_keys is not None:
        remaining = {r._pkey for r in out.select("_pkey").distinct().collect()}
        emptied = [p for p in touched if p not in remaining]
    # ADVICE r6: `out` reads the same parquet path the write below
    # overwrites. Eagerly materialize the merged result FIRST so the
    # overwrite never races its own input — with lazy evaluation the
    # read-while-overwrite pattern only works because dynamic mode stages
    # files and deletes matched partitions at commit, which is fragile
    # across Spark versions/committers. Two materializations are offered
    # (VERDICT r7 #6):
    #   durable=False (default) — localCheckpoint pins the merged rows to
    #     EXECUTOR block storage. Cheap, but on a real cluster an executor
    #     lost during the overwrite destroys its checkpoint blocks MID-
    #     COMMIT, inside the already-non-atomic window below: the write job
    #     then fails part-way with some partitions already swapped. Fine on
    #     local[*]; cluster-unsafe.
    #   durable=True (or conf spark.wikipediaetl.upsert.durableStaging) —
    #     the merged result is written to a staging directory UNDER the
    #     layout path (same filesystem, so a shared FS on a cluster), read
    #     back, and only then overwritten into place. Executor loss during
    #     the overwrite merely fails+retries tasks against durable staging
    #     files; replaying the batch stays the recovery story for a crash
    #     in the commit window itself.
    if durable is None:
        durable = spark.conf.get(_DURABLE_CONF, "false").lower() == "true"
    out, staging = _materialize_merged(spark, out, durable, path)
    # COMMIT WINDOW (documented, not atomic): dynamic partition overwrite
    # commits per-partition directory swaps; a crash DURING job commit can
    # leave the touched set part-old/part-new. A table format's manifest
    # swap closes this window; at directory granularity the recovery story
    # is "replay the batch" — the merge is idempotent by construction.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("_pkey").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        if staging is not None:
            _hadoop_delete(spark, staging)
    for p in emptied:
        _hadoop_delete(spark, f"{path}/_pkey={p}")


def _materialize_merged(
    spark: SparkSession, out: DataFrame, durable: bool, path: str
) -> tuple[DataFrame, str | None]:
    """Materialize the merged result so the overwrite never reads the path
    it rewrites. Durable mode returns a DataFrame whose EVERY input file
    lives under the returned staging dir (asserted by the layout tests);
    the underscore prefix keeps partition discovery on the layout path from
    ever listing the staging files. ``path`` keeps its original scheme so
    staging lands on the SAME filesystem as the layout (file:, hdfs:,
    s3a:, …) and cleanup via the Hadoop FS API resolves correctly."""
    if not durable:
        return out.localCheckpoint(eager=True), None
    import uuid

    staging = f"{path}/_upsert_staging_{uuid.uuid4().hex[:12]}"
    out.write.mode("overwrite").parquet(staging)
    return spark.read.parquet(staging), staging


def _read_spec(path: str) -> dict:
    import json

    with open(f"{path.removeprefix('file:')}/_layout_spec.json") as f:
        return json.load(f)


def _layout_is_verifiably_empty(path: str) -> bool:
    """True iff the layout directory provably holds ZERO data: a
    ``_layout_spec.json`` marker is present and no parquet data file exists
    anywhere under the path. Any other state (missing spec, parquet files
    present but unreadable, FS error during the walk) returns False so the
    caller propagates the original read failure instead of masking it."""
    root = path.removeprefix("file:")
    try:
        if not os.path.isfile(os.path.join(root, "_layout_spec.json")):
            return False
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                    return False
        return True
    except OSError:
        return False


def _read_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read the layout INCLUDING the ``_pkey`` column. A zero-row layout has
    no parquet files to infer from (empty-table onboarding), so fall back to
    an empty frame on the spec's pinned schema — but ONLY when the directory
    verifiably contains the spec marker and zero parquet data files
    (ADVICE r6: a bare except here turned corrupt/partially-written/
    permission-failed reads into "empty table", and inside
    ``upsert_partitioned`` an empty survivor set silently rewrites every
    touched partition with only the change rows — data loss). Every other
    read failure propagates."""
    import json

    from pyspark.sql import types as T

    try:
        return spark.read.parquet(path)
    except Exception:
        if not _layout_is_verifiably_empty(path):
            raise
        schema = T.StructType.fromJson(json.loads(_read_spec(path)["schema"]))
        return (
            spark.createDataFrame([], schema)
            .withColumn("_pkey", F.lit(0).cast("int"))
        )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a ``create_partitioned_table`` layout without the layout column."""
    return _read_layout(spark, path).drop("_pkey")


def materialize_lineitem_rollup(
    spark: SparkSession,
    sf_dir: str,
    table: str = "m_lineitem_by_orderkey",
    n_buckets: int = 32,
) -> None:
    """Join-aggregate pushdown as a stored layout: lineitem pre-aggregated
    to the orderkey grain (line count + exact DECIMAL(18,6) revenue terms),
    written BUCKETED on the grain key so the orders⋈rollup probe is also
    exchange-free. An orderkey-grain query like q12 then joins ~|orders|
    rows instead of ~4×|orders| lineitem rows and merges partials —
    bit-identical to aggregating raw lineitem (per-term decimal casts
    happen before the partial sum, so association order is irrelevant).
    Same incremental-maintenance story as ``merge_batch_into_rollup``."""
    from pyspark.sql import functions as F

    _drop_table(spark, table)
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
        ).alias("revenue_d"),
    )
    agg.write.mode("overwrite").bucketBy(n_buckets, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(table)


def merge_batch_into_lineitem_rollup(
    spark: SparkSession,
    batch: DataFrame,
    table: str = "m_lineitem_by_orderkey",
    n_buckets: int = 32,
    batch_id: int | None = None,
) -> None:
    """Incremental maintenance for the ORDERKEY-grain lineitem rollup
    (``materialize_lineitem_rollup``): fold one ingest batch's partial
    aggregates into the stored summary, preserving the bucketed layout.

    Same associativity argument, staged-swap crash contract, AND replay
    contract as ``merge_batch_into_keyed_rollup`` (commit marker + batch-id
    watermark stamped into the staging TBLPROPERTIES in one ALTER before
    the drop→rename window; a replayed ``batch_id`` ≤ the stored watermark
    is a no-op — see that docstring for the recovery cases); per-term
    DECIMAL(18,6) revenue partials merge exactly in any order, so the
    maintained rollup is bit-identical to rebuilding from the full fact
    history. Cost per batch is O(batch + |grain|), independent of history
    size. q167 drives this end-to-end against the raw-lineitem oracle."""
    from pyspark.sql import functions as F

    staging = f"{table}_staging"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(staging):
        if _staging_committed(spark, staging):
            spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        else:
            _drop_table(spark, staging)
    stored_batch_id = _table_batch_id(spark, table)
    if batch_id is not None and stored_batch_id is not None and batch_id <= stored_batch_id:
        return  # replayed batch already folded into the rollup
    partial = batch.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
        ).alias("revenue_d"),
    )
    if spark.catalog.tableExists(table):
        merged = (
            spark.table(table)
            .select("l_orderkey", "n_lines", "revenue_d")
            .unionByName(
                partial.select(
                    "l_orderkey",
                    "n_lines",
                    F.col("revenue_d").cast("decimal(28,6)").alias("revenue_d"),
                )
            )
            .groupBy("l_orderkey")
            .agg(
                F.sum("n_lines").alias("n_lines"),
                F.sum("revenue_d").cast("decimal(28,6)").alias("revenue_d"),
            )
        )
    else:
        merged = partial.select(
            "l_orderkey",
            "n_lines",
            F.col("revenue_d").cast("decimal(28,6)").alias("revenue_d"),
        )
    _drop_table(spark, staging)
    merged.write.mode("overwrite").bucketBy(n_buckets, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable(staging)
    stamp = batch_id if batch_id is not None else stored_batch_id
    props = f"'{_COMMIT_PROP}'='true'"
    if stamp is not None:
        props += f", '{_BATCH_PROP}'='{int(stamp)}'"
    spark.sql(f"ALTER TABLE {staging} SET TBLPROPERTIES ({props})")
    _drop_table(spark, table)
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")


def merge_batch_into_keyed_rollup(
    spark: SparkSession,
    partial: DataFrame,
    table: str,
    keys: list[str],
    merge_aggs: list,
    bucket_key: str,
    n_buckets: int = 8,
    partition_cols: tuple[str, ...] = (),
    batch_id: int | None = None,
) -> None:
    """Generic incremental maintenance for ANY associatively-mergeable keyed
    rollup (VERDICT r7 #2 — the q167 pattern, factored so each serving
    layout below states only its grain and merge algebra).

    ``partial`` is the batch already aggregated to the rollup grain with
    FINAL column types; ``merge_aggs`` are the combine aggregates (sum for
    additive counts/decimal partials, max for running maxima — anything
    associative+commutative, which is exactly the class a map-side combine
    needs anyway). Staged-swap crash contract identical to
    ``merge_batch_into_rollup``: commit marker after the staging write, so
    a crash in the drop→rename window recovers by rename, and an
    uncommitted staging table is discarded. REPLAY contract (ADVICE r8):
    when ``batch_id`` is given, it is stamped into the staging table's
    TBLPROPERTIES in the same ALTER as the commit marker, BEFORE the main
    table is dropped — the property rides the RENAME, so even the crash
    window where a committed staging (already containing batch N) is
    auto-renamed on the next call leaves a table stamped with N, and a
    replayed ``batch_id <= N`` is a no-op rather than a double-count under
    the sum algebra. Unstamped calls carry a stored watermark forward.
    Cost per batch is O(batch + |grain|) regardless of history size.
    ``partition_cols`` additionally partitions the stored rollup (e.g. by
    year/mode) so serve-time filters become directory pruning on top of
    the bucketed exchange-free join."""

    def build() -> DataFrame:
        cols = partial.columns
        if spark.catalog.tableExists(table):
            return (
                spark.table(table)
                .select(*cols)
                .unionByName(partial.select(*cols))
                .groupBy(*keys)
                .agg(*merge_aggs)
                .select(*cols)
            )
        return partial

    staged_swap_write(
        spark,
        build,
        table,
        bucket_key=bucket_key,
        n_buckets=n_buckets,
        partition_cols=partition_cols,
        batch_id=batch_id,
    )


def staged_swap_write(
    spark: SparkSession,
    build,
    table: str,
    bucket_key: str | None,
    n_buckets: int = 8,
    partition_cols: tuple[str, ...] = (),
    batch_id: int | None = None,
) -> bool:
    """The staged-swap crash contract, factored out of
    ``merge_batch_into_keyed_rollup`` (which now delegates here) so that
    NON-aggregate maintenance — q184's cluster-ledger relabel is a
    join-merge, not a keyed agg — shares byte-identical recovery and
    replay semantics with the keyed rollups:

    1. interrupted-swap recovery: a committed staging left by a crash in
       the drop→rename window is renamed into place; an uncommitted one
       is discarded;
    2. replay watermark: with ``batch_id`` given, a batch at or below the
       stored watermark is a NO-OP (returns False) — ``build`` is never
       invoked, so replays cannot double-apply;
    3. ``build()`` runs only after recovery/replay checks and may lazily
       reference ``spark.table(table)``: the staging write executes while
       the old table still exists, then the swap happens;
    4. the commit marker (+ batch stamp) lands in ONE ALTER on the staging
       table before the old table drops, and rides the rename.

    Returns True iff the swap was applied. ``bucket_key`` may be a single
    column name or a tuple of names (composite bucket spec, e.g. the LSH
    band index's (band_idx, band_hash) probe-join keys)."""
    staging = f"{table}_staging"

    def _rename_into_place() -> None:
        spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
        if partition_cols:
            # a partitioned managed table's per-partition locations still
            # reference the staging directory after RENAME (the catalog
            # tracks partitions individually); recover them from the moved
            # directory layout or every serve-time scan resolves to the
            # deleted staging paths and reads empty
            spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")

    recover_interrupted_swap(spark, table, partition_cols)
    stored_batch_id = _table_batch_id(spark, table)
    if batch_id is not None and stored_batch_id is not None and batch_id <= stored_batch_id:
        return False  # replayed batch already folded in
    merged = build()
    _drop_table(spark, staging)
    w = merged.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if bucket_key is not None:
        bk = (bucket_key,) if isinstance(bucket_key, str) else tuple(bucket_key)
        w = w.bucketBy(n_buckets, *bk).sortBy(*bk)
    w.saveAsTable(staging)
    stamp = batch_id if batch_id is not None else stored_batch_id
    props = f"'{_COMMIT_PROP}'='true'"
    if stamp is not None:
        props += f", '{_BATCH_PROP}'='{int(stamp)}'"
    spark.sql(f"ALTER TABLE {staging} SET TBLPROPERTIES ({props})")
    _drop_table(spark, table)
    _rename_into_place()
    return True


def append_batch_to_layout(
    spark: SparkSession,
    rows: DataFrame,
    table: str,
    bucket_key: str | None = None,
    n_buckets: int = 8,
    partition_cols: tuple[str, ...] = (),
    batch_id: int | None = None,
) -> bool:
    """Replay-gated, crash-recoverable APPEND maintenance for append-only
    layouts — q185's doc histograms and q179/q186's BM25 postings/doclens
    (ADVICE r9 low: those appends were bare ``mode('append')`` with no
    watermark while their paired keyed rollups WERE batch-stamped, so a
    redelivered ingest batch double-appended rows while the rollup merge
    correctly no-opped — silently corrupting served results).

    The staged-swap rollups get replay safety for free because every merge
    REWRITES the table (the stamp rides the rewrite atomically). An
    append-only layout's whole point is O(batch) maintenance — history is
    never rewritten — so the contract here is a two-property protocol on
    the SAME TBLPROPERTIES the rollups use:

    - REPLAY (the foreachBatch at-least-once case): ``batch_id`` at or
      below the committed watermark (``_BATCH_PROP``) → no-op, returns
      False. Rows are never appended twice for a redelivered batch.
    - NORMAL: stamp ``_PENDING_PROP``=batch_id, append the rows carrying a
      constant ``ingest_batch`` column, then commit the watermark. O(batch).
    - CRASH between pending-stamp and commit: that batch's rows may be
      partially present. The NEXT call detects pending > committed and
      rewrites them out (filter on ``ingest_batch``) through
      ``staged_swap_write`` before appending — O(history), but paid only
      on actual crash recovery, never on the normal path.

    Bootstrap (table absent) routes through ``staged_swap_write`` so a
    crash mid-create leaves an uncommitted staging (discarded on recovery)
    rather than an un-provenanced partial table. Callers must create the
    layout through this helper too, so the ``ingest_batch`` column exists
    for the recovery filter; serve paths name their columns explicitly, so
    the extra column never reaches a result schema. Unstamped calls
    (``batch_id=None``) append with a NULL stamp and skip the protocol —
    for untracked loads only."""
    recover_interrupted_swap(spark, table, partition_cols)
    stamped = rows.withColumn(
        "ingest_batch",
        (F.lit(batch_id) if batch_id is not None else F.lit(None)).cast("long"),
    )
    if not spark.catalog.tableExists(table):
        return staged_swap_write(
            spark,
            lambda: stamped,
            table,
            bucket_key,
            n_buckets,
            partition_cols,
            batch_id=batch_id,
        )
    committed = _table_batch_id(spark, table)
    if batch_id is not None and committed is not None and batch_id <= committed:
        return False  # replayed batch: rows already appended + committed
    pending = _table_prop_int(spark, table, _PENDING_PROP)
    if pending is not None and (committed is None or pending > committed):
        # crash mid-append of batch `pending`: scrub its partial rows with
        # one staged swap (watermark carried forward by batch_id=None)
        staged_swap_write(
            spark,
            lambda: spark.table(table).filter(
                F.col("ingest_batch").isNull() | (F.col("ingest_batch") != pending)
            ),
            table,
            bucket_key,
            n_buckets,
            partition_cols,
        )
    if batch_id is not None:
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            f"('{_PENDING_PROP}'='{int(batch_id)}')"
        )
    w = stamped.write.mode("append")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if bucket_key is not None:
        bk = (bucket_key,) if isinstance(bucket_key, str) else tuple(bucket_key)
        w = w.bucketBy(n_buckets, *bk).sortBy(*bk)
    w.saveAsTable(table)
    if batch_id is not None:
        # commit point: watermark >= pending ⟹ the append above is complete
        spark.sql(
            f"ALTER TABLE {table} SET TBLPROPERTIES "
            f"('{_BATCH_PROP}'='{int(batch_id)}')"
        )
    return True


@query(
    "q170_priority_rollup_serving",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q170_priority_rollup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q116 (TPC-H Q4) served from a MAINTAINED max-shipdate rollup
    (VERDICT r7 #2: q116 was 7.3× at 400× — the fact shuffle of the 240M-row
    lineitem probe IS the bill, and the 27M-key build is out of the bloom
    filter's regime).

    The rewrite: EXISTS(l.shipdate > o.orderdate) ⇔ max_ship(orderkey) >
    o_orderdate — so an ORDERKEY-grain rollup of max(l_shipdate) answers Q4
    for ANY date window without touching lineitem at serve time. max is
    associative+commutative, so the rollup maintains incrementally under
    line-grain ingest batches (max of partial maxes; exercised here by
    building from ~90% of lines and merging the rest through
    merge_batch_into_keyed_rollup). The per-query max-aggregate form of
    this rewrite measured NEGATIVE at 400× (tools/exp_q116_q135.py, pinned
    in BENCH_NOTES) — paying the aggregation per query costs more than the
    semi-join it replaces; paying it ONCE at ingest is the version that
    wins, exactly the q167 lesson. Serve plan: 3-month orders filter
    (3.8% selectivity) joins the bucketed |orders|-grain rollup — the
    rollup side is exchange-free, the orders side shuffles 2.3M rows at
    400× instead of the probe's 240M."""
    table = "q170_m_maxship_by_orderkey"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    is_batch = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10)) == 3
    _drop_table(spark, table)
    hist = (
        li.filter(~is_batch)
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    hist.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(table)
    batch_partial = (
        li.filter(is_batch)
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    merge_batch_into_keyed_rollup(
        spark,
        batch_partial,
        table,
        keys=["l_orderkey"],
        merge_aggs=[F.max("max_ship").alias("max_ship")],
        bucket_key="l_orderkey",
    )
    # Serve (400x A/B, tools/bench_bucketed + BENCH_NOTES r8): the DERIVED
    # STATIC filter max_ship > window_start prunes the rollup scan (any
    # order satisfying EXISTS against a windowed orderdate must have
    # max_ship past the window start), and the 3.8%-selectivity orders side
    # is the SHUFFLE_HASH build against the pruned rollup stream — measured
    # 1.91 s vs 2.61 s for the bucketed-SMJ form (32 bucket tasks cap the
    # 60M-row rollup scan's parallelism, the same geometry that loses the
    # plain bucketed q12).
    rollup = spark.table(table).filter(
        F.col("max_ship") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .hint("shuffle_hash")
    )
    res = (
        rollup.join(o, o.o_orderkey == rollup.l_orderkey)
        .filter(F.col("max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .localCheckpoint(eager=True)
    )
    _drop_table(spark, table)
    return res


# Serving-layout queries share their raw-fact oracles with the stock
# queries they re-plan: the hash-check then certifies "the maintained
# layout answers the SAME question with the SAME bits".
from wikipediaetl_spark.operators.tpch import (  # noqa: E402
    COMMITDATE_SQL,
    RECEIPTDATE_SQL,
    SHIPMODE_SQL,
)

_Q171_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey,
             {SHIPMODE_SQL} AS l_shipmode,
             {COMMITDATE_SQL} AS l_commitdate,
             {RECEIPTDATE_SQL} AS l_receiptdate,
             CAST(l_shipdate AS DATE) AS l_shipdate_d
      FROM lineitem
    )
    SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN li ON o_orderkey = l_orderkey
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND l_shipdate_d < l_commitdate
      AND l_receiptdate >= DATE '1996-01-01'
      AND l_receiptdate < DATE '1997-01-01'
    GROUP BY l_shipmode
    """


@query("q171_shipmode_rollup_serving", oracle=_Q171_ORACLE)
def q171_shipmode_rollup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q135 (TPC-H Q12) served from a maintained, PARTITIONED+BUCKETED
    shipmode rollup (VERDICT r7 #2: q135 was 6.0× at 400×; the per-query
    pre-aggregate variant measured negative under the bench session's 32MB
    splits — again the fix is paying the aggregation at ingest, not per
    query).

    Rollup grain: (l_rcptyear, l_shipmode, l_orderkey) → count of lines
    passing Q12's STATIC quality predicate (l_shipdate < l_commitdate <
    l_receiptdate). The receipt-year and shipmode become PARTITION columns
    of the stored rollup and the orderkey its bucket key, so the serve-time
    scan reads exactly the (1996, MAIL)/(1996, SHIP) directories —
    directory pruning, asserted on the plan in tests — and the orders join
    is exchange-free on the rollup side. The count is additive → the
    incremental merge is a sum (merge_batch_into_keyed_rollup; exercised
    with a line-grain 90/10 split). Only the date WINDOW and mode SET stay
    serve-time parameters; the quality predicate is data-quality semantics
    baked into the rollup definition, the standard materialized-view
    contract."""
    table = "q171_m_lines_by_year_mode_orderkey"
    from wikipediaetl_spark.operators.tpch import _with_transport

    li = _with_transport(load_table(spark, sf_dir, "lineitem")).filter(
        (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
    )
    grain = [
        F.year("l_receiptdate").alias("l_rcptyear"),
        "l_shipmode",
        "l_orderkey",
    ]
    is_batch = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10)) == 3
    _drop_table(spark, table)
    hist = (
        li.filter(~is_batch)
        .groupBy(*grain)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist.write.partitionBy("l_rcptyear", "l_shipmode").bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable(table)
    batch_partial = (
        li.filter(is_batch).groupBy(*grain).agg(F.count(F.lit(1)).alias("cnt"))
    )
    merge_batch_into_keyed_rollup(
        spark,
        batch_partial,
        table,
        keys=["l_rcptyear", "l_shipmode", "l_orderkey"],
        merge_aggs=[F.sum("cnt").cast("long").alias("cnt")],
        bucket_key="l_orderkey",
        partition_cols=("l_rcptyear", "l_shipmode"),
    )
    # Serve (400x A/B, BENCH_NOTES r8): the directory-pruned rollup slice is
    # the SHUFFLE_HASH build against the RAW orders stream — 3.51 s vs
    # 7.75 s for joining the bucketed orders table (exchange-free but the
    # 32-bucket scan caps the 60M-row side's parallelism). The residual
    # serve cost IS the orders stream; q173 is the next rung of the same
    # ladder (priority folded into the grain at ingest → O(answer) serve).
    rollup = spark.table(table).filter(
        (F.col("l_rcptyear") == 1996) & F.col("l_shipmode").isin("MAIL", "SHIP")
    ).hint("shuffle_hash")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    res = (
        rollup.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, F.col("cnt")).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, F.col("cnt")).otherwise(0)).alias("low_line_count"),
        )
        .localCheckpoint(eager=True)
    )
    _drop_table(spark, table)
    return res


@query("q173_shipmode_mv_serving", oracle=_Q171_ORACLE)
def q173_shipmode_mv_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q135 (TPC-H Q12) served from the FULL materialized aggregate — the
    top rung of the serving ladder q170-q172 climb. Grain: (l_rcptyear,
    l_shipmode, o_orderpriority) → qualifying-line count. The order's
    priority is attached to each line batch AT INGEST (the q172 enrich
    join — orders rows for a batch's lines are already ingested), so the
    count is additive at this grain and incremental maintenance is a
    3-key sum merge (merge_batch_into_keyed_rollup, exercised with the
    90/10 line split here). Serve is O(answer): a ~(years × modes ×
    priorities)-row scan + a 2-group aggregate — measured 0.22 s at 400×
    (0.17× vs the comparator's 1.25 s full recompute).

    The flexibility trade vs q171, stated plainly: this grain answers the
    Q12 FAMILY (any year window × mode set × priority split) and nothing
    else — no per-order joins. A deployment keeps q171's orderkey grain
    for ad-hoc joins AND this answer-grain MV for its dashboard family;
    both maintain incrementally from the same ingest batch for O(batch)
    each. Reference tie: the categorizer's category-distribution summary
    (ETL/tasks/categorizer.py:178-191) is exactly this pattern."""
    table = "q173_mv_q12_year_mode_priority"
    li = _with_transport_lines(spark, sf_dir).filter(
        (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    enriched = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    grain = [
        F.year("l_receiptdate").alias("l_rcptyear"),
        "l_shipmode",
        "o_orderpriority",
    ]
    is_batch = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10)) == 3
    _drop_table(spark, table)
    (
        enriched.filter(~is_batch)
        .groupBy(*grain)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .write.bucketBy(4, "l_rcptyear")
        .sortBy("l_rcptyear")
        .saveAsTable(table)
    )
    batch_partial = (
        enriched.filter(is_batch)
        .groupBy(*grain)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    merge_batch_into_keyed_rollup(
        spark,
        batch_partial,
        table,
        keys=["l_rcptyear", "l_shipmode", "o_orderpriority"],
        merge_aggs=[F.sum("cnt").cast("long").alias("cnt")],
        bucket_key="l_rcptyear",
        n_buckets=4,
    )
    mv = spark.table(table).filter(
        (F.col("l_rcptyear") == 1996) & F.col("l_shipmode").isin("MAIL", "SHIP")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    res = (
        mv.groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, F.col("cnt")).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, F.col("cnt")).otherwise(0)).alias("low_line_count"),
        )
        .localCheckpoint(eager=True)
    )
    _drop_table(spark, table)
    return res


def _with_transport_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wikipediaetl_spark.operators.tpch import _with_transport

    return _with_transport(load_table(spark, sf_dir, "lineitem"))


@query(
    "q172_market_share_denorm",
    oracle="""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                         THEN CAST(volume AS DECIMAL(18,6))
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q172_market_share_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q124 (TPC-H Q8) served from a DENORMALIZED lineitem⋈orders fact
    partitioned by order year (VERDICT r7 #2: q124 was 6.2× at 400×). Q8
    needs line-grain part/supp keys, so no orderkey-grain rollup can serve
    it — the layout lever for this shape is materializing the fact-fact
    JOIN at ingest instead. Every line is stored with its order's year and
    custkey attached (o_year partition column), plus the line's exact
    scaled-long revenue unit vu = floor(extprice·(1-disc)·1e4 + 0.5) — the
    same unit q124's salted partials sum, so serving reproduces q124's
    decimal/double rounding bit-for-bit.

    Maintenance is APPEND-ONLY: new lines arrive, join their (already
    ingested) order row — the stream-static enrich shape q147 runs — and
    append into the year partition; no rewrite of history (exercised here
    by building from ~90% of lines and appending the rest through the same
    enrich join). Serve plan: partition pruning keeps only the 1996/1997
    directories (2 of 7 years), dims broadcast, one partial-agg — the
    60M-row orders shuffle is GONE from query time, which is the whole
    6.2× bill."""
    table = "q172_denorm_lineitem_orders"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
        )
        .cast("long")
        .alias("vu"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year"), "o_custkey"
    )
    is_batch = F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), F.lit(10)) == 3
    enrich = lambda lines: lines.join(  # noqa: E731
        o, lines.l_orderkey == o.o_orderkey
    ).select("l_partkey", "l_suppkey", "vu", "o_year", "o_custkey")
    _drop_table(spark, table)
    enrich(li.filter(~is_batch)).write.partitionBy("o_year").saveAsTable(table)
    enrich(li.filter(is_batch)).write.mode("append").partitionBy("o_year").saveAsTable(
        table
    )
    from wikipediaetl_spark.operators.relational import _t

    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_keys = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(eu_keys), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    fact = spark.table(table).filter(F.col("o_year").isin(1996, 1997))
    partial = (
        fact.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("o_year", F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vu")).otherwise(0)
            ).alias("pnum"),
            F.sum("vu").alias("pden"),
        )
    )
    num = (F.sum(F.col("pnum").cast("decimal(38,0)")) / 10000).cast("double")
    den = (F.sum(F.col("pden").cast("decimal(38,0)")) / 10000).cast("double")
    res = (
        partial.groupBy("o_year")
        .agg((num / den).alias("mkt_share"))
        .localCheckpoint(eager=True)
    )
    _drop_table(spark, table)
    return res


@query(
    "q167_rollup_serving",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(n_lines AS BIGINT)) AS BIGINT) AS n_lines,
           CAST(sum(revenue_d) AS DOUBLE) AS revenue
    FROM (
      SELECT l_orderkey,
             count(*) AS n_lines,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS revenue_d
      FROM lineitem GROUP BY l_orderkey
    )
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q167_rollup_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AGGREGATE half of the layout story (VERDICT r6 #5) — q166's
    pattern applied to a materialized rollup: build the orderkey-grain
    lineitem rollup from ~90% of the fact history, fold the remaining 10%
    in through ``merge_batch_into_lineitem_rollup`` (staged swap, exact
    DECIMAL partials), then answer the q12 fact-fact shape FROM THE
    MAINTAINED ROLLUP — and hash-match the oracle computed from raw
    lineitem. Because the per-order partials merge associatively, the
    maintained rollup's totals are bit-identical to a full rebuild, which
    is exactly the invariant that lets a 100 TB deployment serve
    orderkey-grain joins from ~|orders| rollup rows (1.40× vs DuckDB at
    400×, BENCH_BUCKETED_400x.json — vs 4.1× for the stock fact-fact
    join) while ingest maintains the rollup at O(batch + grain) per
    micro-batch. Reference tie: the categorizer's bridge aggregation at
    scale (ETL/tasks/categorizer.py:178-187). The managed scratch table
    lives in the session warehouse (shared FS on a real cluster); the
    small result is checkpointed so the table can be dropped before
    return."""
    table = "q167_m_lineitem_by_orderkey"
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    is_batch = F.pmod(F.col("l_orderkey"), F.lit(10)) == 7
    _drop_table(spark, table)
    hist_partial = (
        li.filter(~is_batch)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("decimal(28,6)")
            .alias("revenue_d"),
        )
    )
    hist_partial.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(table)
    merge_batch_into_lineitem_rollup(spark, li.filter(is_batch), table, n_buckets=8)
    rollup = spark.table(table)
    res = (
        rollup.join(o, rollup.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("revenue_d").cast("double").alias("revenue"),
        )
        .localCheckpoint(eager=True)
    )
    _drop_table(spark, table)
    return res


@query(
    "q166_storage_merge_roundtrip",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice + 1 AS o_totalprice,
             2 AS src
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', 1.0, 1
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    all_rows AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS src FROM orders
      UNION ALL SELECT * FROM changes
    ),
    merged AS (
      SELECT * FROM all_rows
      QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY src DESC) = 1
    )
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q166_storage_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORAGE half of the upsert story (VERDICT r5 #6), driver-checked:
    q158 resolves MERGE semantics as a query; this query executes the same
    merge against a real partitioned-parquet warehouse layout —
    ``create_partitioned_table`` → ``upsert_partitioned`` (dynamic
    partition overwrite, only touched directories rewritten) → re-read —
    and returns the re-read snapshot, which must hash-match the SAME oracle
    as q158. This is the reference's ORM read-modify-write
    (ETL/tasks/categorizer.py:143-195) against files instead of MySQL.
    The warehouse lives in a per-call scratch dir under
    ``$SPARK_GRAFT_SCRATCH_DIR`` when set — on a real cluster point that at
    a SHARED filesystem (HDFS/S3/NFS) so executors can reach it; the
    ``tempfile.mkdtemp`` fallback is driver-local and therefore
    LOCAL-MODE-ONLY (ADVICE r6). The 5-row snapshot is eagerly
    localCheckpoint'ed so the returned DataFrame outlives the cleanup."""
    import shutil as _shutil
    import tempfile

    scratch_root = os.environ.get("SPARK_GRAFT_SCRATCH_DIR") or None

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1).alias("o_totalprice"),
    )
    inserts = o.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    changes = updates.unionByName(
        inserts.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    )
    tmp = tempfile.mkdtemp(prefix="wh_merge_q166_", dir=scratch_root)
    try:
        path = f"{tmp}/orders_wh"
        create_partitioned_table(o, path, "o_orderkey", n_partitions=16)
        upsert_partitioned(spark, path, changes, "o_orderkey")
        snap = (
            read_partitioned(spark, path)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
                ).alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
    return snap


# ------------------------------------------------------- star answer-grain MV


def star_mv_serve(spark: SparkSession, table: str) -> DataFrame:
    """q176's serve plan, factored for plan-assertion (the q174/q175
    pattern): ONE scan of the answer-family MV + a two-key aggregate. No
    joins, no fact scan — the at-scale serve cost is O(regions × nations ×
    years), independent of the orders table entirely."""
    mv = spark.table(table)
    return mv.groupBy("r_name", "n_name").agg(
        F.sum("n_orders").alias("n_orders"),
        (F.sum("cents").cast("double") / 100.0).alias("revenue"),
    )


@query(
    "q176_star_mv_serving",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q176_star_mv_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11's star join served from an ANSWER-GRAIN materialized aggregate —
    the q173 discipline applied to the star family (VERDICT r8 #6: q11's
    orderkey-rollup rung plateaued at 2.22×; the remaining serve cost was
    the |customer|-grain join, which this rung moves to ingest).

    Grain: (r_name, n_name, o_year) → order count + exact integer-CENTS
    revenue partial. The dims are attached to each orders batch AT INGEST
    (customer via SHUFFLE_HASH — it is fact-sized relative to a batch;
    nation/region broadcast), so both measures are additive at this grain
    and incremental maintenance is a 3-key sum merge
    (merge_batch_into_keyed_rollup, exercised with a 90/10 orders split).
    Keeping o_year IN the grain (rather than collapsing to the 25-row
    answer) is the family trade: the MV answers revenue-per-region/nation
    for ANY year window with a ~175-row scan, the same contract q173
    states for the Q12 family.

    Serve is O(answer family): one scan of the MV + a 2-key aggregate —
    no join, no fact scan (star_mv_serve, plan-asserted). Cents partials
    are exact longs (the q11 argument: 2-decimal fixture money makes
    floor(x·100+0.5) lossless and a long sum order-independent), so the
    maintained MV reproduces q11's bits and hash-matches its raw-fact
    oracle. Reference tie: the categorizer's category-distribution summary
    (ETL/tasks/categorizer.py:178-191) maintained instead of recomputed."""
    table = "q176_mv_orders_by_region_nation_year"
    from wikipediaetl_spark.operators.relational import _t

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").alias("o_year"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("o_cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    enrich = lambda orders: (  # noqa: E731
        orders.join(c.hint("shuffle_hash"), orders.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    grain = ["r_name", "n_name", "o_year"]
    partial = lambda orders: (  # noqa: E731
        enrich(orders)
        .groupBy(*grain)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("o_cents").alias("cents"),
        )
    )
    is_batch = F.pmod(F.col("o_orderkey") * 13 + 5, F.lit(10)) == 3
    _drop_table(spark, table)
    (
        partial(o.filter(~is_batch))
        .write.bucketBy(4, "o_year")
        .sortBy("o_year")
        .saveAsTable(table)
    )
    merge_batch_into_keyed_rollup(
        spark,
        partial(o.filter(is_batch)),
        table,
        keys=grain,
        merge_aggs=[
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        ],
        bucket_key="o_year",
        n_buckets=4,
    )
    res = star_mv_serve(spark, table).localCheckpoint(eager=True)
    _drop_table(spark, table)
    return res
