"""Streaming tests: windowed agg batch/stream parity, stateful top-X."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.sources.tables import load_table, points_from_events
from hbase_gis_spark.streaming.events import (
    read_event_stream,
    run_stream_to_memory,
    streaming_top_x_earliest,
    user_sessions,
    windowed_event_counts,
)
from tests.conftest import SF0001


def test_windowed_counts_stream_matches_batch(spark):
    batch = load_table(spark, SF0001, "events")
    expect = {
        (r.ws, r.event_type): (r.n, r.value_sum)
        for r in windowed_event_counts(batch).collect()
    }

    stream = read_event_stream(spark, SF0001)
    assert stream.isStreaming
    run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="update"
    )
    got = {
        (r.ws, r.event_type): (r.n, r.value_sum)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expect and len(expect) > 0


def test_user_sessions_stream_matches_batch(spark):
    batch = load_table(spark, SF0001, "events")
    expect = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in user_sessions(batch).collect()
    }
    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        user_sessions(stream), "sessions", output_mode="complete"
    )
    got = {
        (r.ss, r.se, r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == expect and len(expect) > 0


def test_streaming_geofence_matches_batch_within(spark):
    """within() is a stateless filter — identical results over
    readStream (the geofence shape: points stream in, matches stream
    out)."""
    from hbase_gis_spark.operators.within import within

    wkt = (
        "POLYGON ((-74.00 40.70, -73.95 40.85, -73.90 40.75, "
        "-73.95 40.65, -74.00 40.70))"
    )
    batch_pts = points_from_events(load_table(spark, SF0001, "events"))
    expect = {r.id for r in within(batch_pts, wkt).collect()}

    stream_pts = points_from_events(read_event_stream(spark, SF0001))
    assert stream_pts.isStreaming
    run_stream_to_memory(
        within(stream_pts, wkt).select("id"), "geofence", output_mode="append"
    )
    got = {r.id for r in spark.sql("SELECT * FROM geofence").collect()}
    assert got == expect and len(expect) > 0


def test_streaming_topx_matches_batch_topx(spark):
    from hbase_gis_spark.operators.topx import top_x

    batch = load_table(spark, SF0001, "events")
    x = 3
    expect = {
        (r.user_id, r.event_id)
        for r in top_x(batch, "user_id", "ts", x, tiebreak_col="event_id").collect()
    }

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        streaming_top_x_earliest(stream, x), "stream_topx", output_mode="update"
    )
    # final state per user = last emitted batch per user
    got = {
        (r.user_id, r.event_id)
        for r in spark.sql("SELECT * FROM stream_topx").collect()
    }
    assert got == expect


def test_streaming_dedup_matches_batch(spark):
    """dropDuplicatesWithinWatermark on the stream returns the same key
    set as batch dropDuplicates (first occurrence per user)."""
    from hbase_gis_spark.streaming.events import dedup_events

    batch = load_table(spark, SF0001, "events")
    expect = {r.user_id for r in dedup_events(batch, ["user_id"]).collect()}

    stream = read_event_stream(spark, SF0001)
    run_stream_to_memory(
        dedup_events(stream, ["user_id"]).select("user_id"),
        "dedup_stream",
        output_mode="append",
    )
    got = {r.user_id for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    assert got == expect and len(expect) > 0
