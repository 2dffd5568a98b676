"""UDF shipping: make engine modules picklable BY VALUE.

Spark serializes Python UDFs with cloudpickle. A function defined at
module level is pickled *by reference* (module + qualname), which
requires every executor's Python worker to be able to ``import
video_streamer_spark`` — true in our tests (cwd = repo root) but NOT
when an external driver imports the engine from elsewhere. Registering
the defining module for by-value pickling embeds the function body in
the task closure instead, so UDFs run on workers that have only
pyspark/numpy/pandas installed.

Call ``ship_module(sys.modules[__name__])`` in any module that defines
functions referenced from inside UDFs/mapInPandas closures.
"""

from __future__ import annotations

from types import ModuleType

_shipped: set[str] = set()


def ship_module(mod: ModuleType) -> None:
    if mod.__name__ in _shipped:
        return
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(mod)
        _shipped.add(mod.__name__)
    except Exception:
        # older cloudpickle without register_pickle_by_value: fall back to
        # requiring the package on the worker path (test environments)
        pass
