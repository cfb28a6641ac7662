"""Fixture-shape contract for the events table (VERDICT r3 #1).

The driver has regenerated ``events.parquet`` with different physical
``ts`` types across rounds (int64 TIMESTAMP(NANOS) → timestamp[us]).
``load_table`` / ``stream_events`` must branch on the ACTUAL read type,
and a future physical-type change must fail loudly here, not silently
collapse timestamps 1000× (the round-3 regression).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oracle_vector_search_spark.io import load_table


def test_events_exposes_ts_and_ts_ns(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    schema = {f.name: f.dataType for f in e.schema.fields}
    assert isinstance(schema["ts"], T.TimestampType)
    assert isinstance(schema["ts_ns"], T.LongType)
    # Column order contract (star-select stability across fixtures).
    assert e.columns[:2] == ["event_id", "ts_ns"]
    assert e.columns[-1] == "ts"


def test_events_ts_in_expected_year(spark, sf_dir):
    """Timestamps must land in a plausible fixture year — a µs column
    misread as nanos collapses everything to ~1970 and fails here."""
    row = load_table(spark, sf_dir, "events").agg(
        F.min(F.year("ts")).alias("ymin"),
        F.max(F.year("ts")).alias("ymax"),
    ).collect()[0]
    assert 2000 <= row.ymin <= row.ymax <= 2100, (row.ymin, row.ymax)


def test_events_ts_ns_consistent_with_ts(spark, sf_dir):
    """ts_ns must be exactly unix_micros(ts)*1000 for every row (both
    derivation branches must agree on the instant)."""
    bad = (
        load_table(spark, sf_dir, "events")
        .where(F.col("ts_ns") != F.unix_micros("ts") * F.lit(1000))
        .count()
    )
    assert bad == 0


def test_stream_events_schema_matches_batch(spark, sf_dir):
    """The stream loader must inherit the batch loader's schema decision
    — never a hard-coded physical type."""
    from oracle_vector_search_spark.streaming.ops import stream_events

    batch = load_table(spark, sf_dir, "events")
    stream = stream_events(spark, sf_dir)
    assert stream.columns == batch.columns
    assert [f.dataType for f in stream.schema.fields] == [
        f.dataType for f in batch.schema.fields
    ]
