"""applyInPandasWithState running totals must equal the batch aggregate
over the same events after draining the stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SMOKE_SF_DIR

from trino_adaptive_partitioning_tool_spark.sources import tables
from trino_adaptive_partitioning_tool_spark.streaming import stateful


def test_running_user_totals_match_batch(spark, tmp_path):
    stream = stateful.stream_events(spark, SMOKE_SF_DIR)
    assert stream.isStreaming
    out = stateful.running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        # update-mode memory sink appends per-batch updates; the LAST row
        # per user is the final state
        for r in spark.table("user_totals").collect()
    }

    batch = tables.load_table(spark, SMOKE_SF_DIR, "events")
    want = {
        r["user_id"]: (r["n"], round(r["total"], 4))
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("total"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        gn, gtotal = got[uid]
        assert gn == n, uid
        assert abs(gtotal - total) < 1e-6, uid


def test_stream_events_ts_matches_batch_loader(spark):
    """stream_events must decode ts identically to the batch loader —
    the ns-vs-µs testdata encoding is probed from the footer, never
    assumed (a ns conversion over µs data lands in 1970)."""
    import tempfile
    import uuid

    from conftest import SMOKE_SF_DIR
    from trino_adaptive_partitioning_tool_spark.sources import tables
    from trino_adaptive_partitioning_tool_spark.streaming import stateful

    name = f"ts_probe_{uuid.uuid4().hex[:6]}"
    q = (
        stateful.stream_events(spark, SMOKE_SF_DIR)
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp() + "/c")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["event_id"]: r["ts"] for r in spark.table(name).collect()
    }
    want = {
        r["event_id"]: r["ts"]
        for r in tables.load_table(spark, SMOKE_SF_DIR, "events")
        .select("event_id", "ts")
        .collect()
    }
    assert got == want
