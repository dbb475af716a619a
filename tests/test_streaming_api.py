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
