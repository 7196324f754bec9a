"""applyInPandasWithState: running per-key stats across micro-batches must
converge to the batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipediaetl_spark.sources import load_table
from wikipediaetl_spark.streaming.queries import _events_stream, _run_to_completion
from wikipediaetl_spark.streaming.stateful import running_user_stats


def test_running_stats_converge_to_batch(spark, sf_dir):
    stream = _events_stream(spark, sf_dir)
    out = _run_to_completion(running_user_stats(stream), "update")
    # update mode emits one row per key per batch; the last emission per key
    # is the final state — with a single input file there is one batch.
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
        .collect()
    )
    batch = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert len(final) == len(batch)
    for r in final:
        assert r.n_events == batch[r.user_id].n
        assert abs(r.max_value - batch[r.user_id].mx) < 1e-9


def test_foreach_batch_sink_checkpoint_recovery(spark, sf_dir, tmp_path):
    """The checkpointed sink must not re-emit processed batches on restart —
    the engine's replacement for the reference's ack semantics."""
    from wikipediaetl_spark.streaming.queries import foreach_batch_parquet_sink

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = _events_stream(spark, sf_dir).select("event_id", "user_id")

    q1 = foreach_batch_parquet_sink(src, out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    n_first = spark.read.parquet(out).count()
    n_events = load_table(spark, sf_dir, "events").count()
    assert n_first == n_events

    # restart from the same checkpoint: offsets are committed → no new data,
    # no duplicate writes
    q2 = foreach_batch_parquet_sink(src, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n_events
