"""Stream-schema ↔ parquet-footer contract (VERDICT r3 item 8).

A file-stream source declares its schema up front; if the declaration
disagrees with what the file actually stores, Spark does not error — it
silently misreads (the round-3 bug: a timestamp[us] file read through a
long-nanos schema compressed 30 days of events into ~43 minutes). These
tests make that class of bug a test failure for every table a streaming
query reads.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from data_finder_comparator_spark.streaming.pipeline import (
    _events_stream,
    events_stream_schema,
)

SF = "/root/testdata/sf0.001"

# arrow physical type -> the Spark type the declared stream schema must
# use for it (under the session's legacy nanosAsLong conf)
_ARROW_TO_SPARK = {
    pa.int64(): T.LongType(),
    pa.float64(): T.DoubleType(),
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
    pa.timestamp("us"): T.TimestampNTZType(),
    pa.timestamp("ms"): T.TimestampNTZType(),
    # nanos arrives as a raw long (legacy conf) and is rebuilt in-plan
    pa.timestamp("ns"): T.LongType(),
}


def test_events_stream_schema_matches_footer():
    """Every declared field of the events stream schema must agree with
    the parquet footer — name-for-name, type-for-type."""
    footer = pq.read_schema(os.path.join(SF, "events.parquet"))
    declared, nanos = events_stream_schema(SF)
    assert [f.name for f in declared.fields] == footer.names
    for field in declared.fields:
        arrow_t = footer.field(field.name).type
        assert arrow_t in _ARROW_TO_SPARK, f"unmapped arrow type {arrow_t}"
        assert field.dataType == _ARROW_TO_SPARK[arrow_t], (
            f"{field.name}: declared {field.dataType} but footer stores {arrow_t}"
        )
    # the conversion flag must mirror the footer, not an assumption
    assert nanos == (footer.field("ts").type == pa.timestamp("ns"))


def test_stream_timestamps_match_batch(spark):
    """End-to-end unit guard: the streamed min/max event time must equal
    the batch loader's (which infers from the footer). A unit mismatch
    moves the range by orders of magnitude, so exact equality here pins
    the contract."""
    from pyspark.sql import functions as F

    from data_finder_comparator_spark.sources.parquet import load_table

    batch = load_table(spark, SF, "events").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]

    ev = _events_stream(spark, SF)
    q = (
        ev.groupBy()
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ts_range_probe")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        got = spark.table("ts_range_probe").collect()[0]
    finally:
        q.stop()
        spark.catalog.dropTempView("ts_range_probe")
    assert (got.lo, got.hi) == (batch.lo, batch.hi)


def test_stream_confs_restored_after_query(spark, tmp_path):
    """The streaming wrapper must not leak session-global conf: both the
    stream shuffle-partition override and the scoped nanosAsLong value
    are restored to their pre-call values once the query completes
    (VERDICT r4 item 7 — previously _events_stream mutated nanosAsLong
    for the session's lifetime)."""
    from data_finder_comparator_spark.streaming.pipeline import (
        watermarked_event_counts,
    )

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior_nanos = spark.conf.get(key, None)
    prior_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # sentinel: a value the stream itself must override while
        # running, then put back
        spark.conf.set(key, "false")
        out = watermarked_event_counts(spark, SF, sink_dir=str(tmp_path / "wm"))
        out.count()  # sink scan works after restoration
        assert spark.conf.get(key) == "false"
        assert spark.conf.get("spark.sql.shuffle.partitions") == prior_shuffle

        # unset case: a conf with no prior value is unset again, not
        # left behind with the streaming override
        spark.conf.unset(key)
        watermarked_event_counts(spark, SF, sink_dir=str(tmp_path / "wm2")).count()
        assert spark.conf.get(key, None) is None
    finally:
        if prior_nanos is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior_nanos)


def test_stream_results_independent_of_session_timezone(spark, tmp_path):
    """A non-UTC ambient session must produce byte-identical windowed
    results: ``_stream_confs`` pins spark.sql.session.timeZone=UTC for
    the query's lifetime (the NTZ<->TIMESTAMP casts in the windowed
    queries assume UTC — r13 review finding, previously latent because
    every harness session already ran UTC), then restores the caller's
    value."""
    from data_finder_comparator_spark.streaming.pipeline import (
        watermarked_event_counts,
    )

    key = "spark.sql.session.timeZone"
    prior = spark.conf.get(key)
    utc_rows = sorted(
        map(tuple, watermarked_event_counts(spark, SF, sink_dir=str(tmp_path / "utc")).collect())
    )
    try:
        spark.conf.set(key, "America/New_York")
        est_rows = sorted(
            map(tuple, watermarked_event_counts(spark, SF, sink_dir=str(tmp_path / "est")).collect())
        )
        # caller's ambient TZ restored, not clobbered to UTC
        assert spark.conf.get(key) == "America/New_York"
    finally:
        spark.conf.set(key, prior)
    assert est_rows == utc_rows and len(utc_rows) > 0


def test_windowed_counts_memory_sink_equivalence(spark):
    """Stream/batch equivalence harness (complete-mode memory sink) —
    unit-test only; the REGISTERED streaming_window_counts query runs
    the same aggregation through a foreachBatch parquet sink instead
    (no driver-side collect in any registered plan)."""
    from pyspark.sql import functions as F

    from data_finder_comparator_spark.sources.parquet import load_table
    from data_finder_comparator_spark.streaming.pipeline import (
        _windowed_counts_agg,
        _stream_confs,
        _NANOS_CONF,
    )

    agg = _windowed_counts_agg(spark, SF, "1 hour", None)
    with _stream_confs(spark, _NANOS_CONF):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("wc_equiv_probe")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            streamed = {
                (r.win_start, r.event_type): (r.n_events, round(r.sum_value, 6))
                for r in spark.table("wc_equiv_probe").collect()
            }
        finally:
            q.stop()
            spark.catalog.dropTempView("wc_equiv_probe")

    batch = {
        (r.win_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value")
        .collect()
    }
    assert streamed == batch


def test_nanos_file_still_converts(spark, tmp_path):
    """The legacy long-nanos path must keep working: a synthesized
    TIMESTAMP(NANOS)-convention file (int64 nanos) round-trips to the
    same NTZ instants through the stream source."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                [int((base + pd.Timedelta(minutes=m)).value) for m in (0, 90)],
                pa.int64(),
            ),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "purchase"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(rows, str(tmp_path / "events.parquet"))

    declared, nanos = events_stream_schema(str(tmp_path))
    assert nanos and declared["ts"].dataType == T.LongType()

    ev = _events_stream(spark, str(tmp_path))
    assert ev.schema["ts"].dataType == T.TimestampNTZType()
    q = (
        ev.select("event_id", "ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("nanos_probe")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        got = {r.event_id: r.ts for r in spark.table("nanos_probe").collect()}
    finally:
        q.stop()
        spark.catalog.dropTempView("nanos_probe")
    assert got[1] == base.to_pydatetime()
    assert got[2] == (base + pd.Timedelta(minutes=90)).to_pydatetime()
