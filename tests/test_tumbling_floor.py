"""events_tumbling_1h's integer bucket vs F.window — ALL epochs.

The r10 rewrite replaced F.window's four per-row timestamp
conversions with one integer division over epoch-ns, but `div`
truncates toward zero while F.window floors — pre-1970 (negative
epoch) timestamps silently landed one bucket late (ADVICE r10).
r11 switched to an exact floor-division spelling; this pins batch
tumbling ≡ F.window on a corpus straddling the epoch.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hetnetdb_spark.streaming.queries import events_tumbling_1h


@pytest.fixture()
def epoch_straddling_events(spark, tmp_path):
    """events scratch dir with ns timestamps around epoch 0,
    including exact hour boundaries and both signs."""
    hour_ns = 3_600_000_000_000
    # all values µs-aligned (multiples of 1000 ns) — the fixture/
    # catalog contract; non-aligned ns would make the ns→µs
    # truncation itself diverge for negatives, a separate concern
    ts_vals = [
        -3 * hour_ns,             # exact negative boundary
        -3 * hour_ns + 1000,      # just after a negative boundary
        -1000,                    # last µs before epoch
        0,                        # epoch itself
        1000,
        hour_ns - 1000,
        hour_ns,
        5 * hour_ns + 12_000,
        -2 * hour_ns - 1000,      # just BEFORE a negative boundary
    ]
    rows = [
        (i, t, i % 3, "click" if i % 2 else "view", float(i), "{}")
        for i, t in enumerate(ts_vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_tumbling_matches_f_window_across_epoch(spark, epoch_straddling_events):
    got = (
        events_tumbling_1h(spark, epoch_straddling_events)
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    ref_df = spark.read.parquet(f"{epoch_straddling_events}/events.parquet")
    ref_df = ref_df.withColumn("tts", F.timestamp_micros(F.expr("ts div 1000")))
    # F.window on the µs timestamp is the floor-semantics reference;
    # ts values at exact ns boundaries are µs-aligned by construction.
    ref = (
        ref_df.groupBy(F.window("tts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
        .toPandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(ref[got.columns.tolist()].astype(got.dtypes.to_dict()))
