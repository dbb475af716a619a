"""Pin the Spark 4 transformWithStateInPandas API that t10 uses.

t10_transform_with_state (streaming/queries.py) is registration-gated
on `google.protobuf`. Since round 8 the repo vendors a minimal
pure-Python runtime (vendor/miniproto) that satisfies the gate, so
t10 runs for real here (test_miniproto.py covers the wire protocol
and the end-to-end stream). These API pins stay valuable regardless:
if a PySpark upgrade changes the StatefulProcessor contract, they
fail with a named assertion instead of a worker crash.
"""

from __future__ import annotations

import inspect

from tests.conftest import SF_DIR


def test_stateful_processor_abstract_surface():
    from pyspark.sql.streaming import StatefulProcessor

    methods = {m for m in dir(StatefulProcessor) if not m.startswith("_")}
    # t10's TypeCounter implements init/handleInputRows/close.
    assert {"init", "handleInputRows", "close"} <= methods


def test_handle_get_map_state_signature():
    from pyspark.sql.streaming import StatefulProcessorHandle

    params = list(inspect.signature(StatefulProcessorHandle.getMapState).parameters)
    # t10 calls getMapState("type_counts", "event_type string", "n long")
    # positionally: (self, stateName, userKeySchema, valueSchema, ...).
    assert params[:4] == ["self", "stateName", "userKeySchema", "valueSchema"]


def test_map_state_methods_and_tuple_contract():
    from pyspark.sql.streaming.stateful_processor import MapState

    methods = {m for m in dir(MapState) if not m.startswith("_")}
    assert {"containsKey", "getValue", "updateValue", "iterator"} <= methods
    # t10 passes/reads 1-tuples: updateValue((etype,), (n,)) and
    # getValue(...)[0] — the API is Tuple→Tuple.
    assert "Tuple" in str(inspect.signature(MapState.updateValue))
    assert "Tuple" in str(inspect.signature(MapState.getValue))


def test_transform_with_state_kwargs():
    from pyspark.sql.pandas.group_ops import PandasGroupedOpsMixin

    params = inspect.signature(
        PandasGroupedOpsMixin.transformWithStateInPandas
    ).parameters
    # Exactly the kwargs t10 passes.
    assert {"statefulProcessor", "outputStructType", "outputMode", "timeMode"} <= set(
        params
    )


def test_t28_chained_join_state_is_bounded_and_evicts(spark):
    """t28 (r14): the chained funnel must run TWO stateful join
    operators, and both must report watermark-driven row REMOVAL —
    a wrong state-watermark propagation through the intermediate
    relation either leaks the first join's buffer forever (no
    removals) or drops matches (caught by the oracle twin). Also
    pins that the intermediate carries exactly one event-time
    column by succeeding at all (Spark 4 rejects two)."""
    from pyspark.sql import functions as F

    from hetnetdb_spark.catalog import table_path
    from hetnetdb_spark.streaming.queries import _events_stream

    path = table_path(SF_DIR, "events")

    def leg(event_type, prefix):
        return (
            _events_stream(spark, path)
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    funnel = (
        leg("signup", "s")
        .join(
            leg("click", "c"),
            (F.col("c_user") == F.col("s_user"))
            & (F.col("c_ts") >= F.col("s_ts"))
            & (F.col("c_ts") <= F.col("s_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .drop("s_ts")
        .join(
            leg("purchase", "p"),
            (F.col("p_user") == F.col("s_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
    )
    q = (
        funnel.writeStream.format("memory")
        .queryName("t28_state_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ops = q.lastProgress["stateOperators"]
    joins = [o for o in ops if "Join" in o.get("operatorName", "")]
    assert len(joins) == 2, ops
    # Eviction: every join's state must have removed rows as the
    # watermark advanced across the 30-day fixture, and what REMAINS
    # at the end must be a small residue (rows inside the final
    # watermark horizon), not the accumulated input — a leak shows as
    # numRowsRemoved == 0 with numRowsTotal ~ input size.
    for op in joins:
        assert op["numRowsRemoved"] > 0, op
        assert op["numRowsTotal"] < op["numRowsRemoved"], op
