"""Named function registry + built-in column builders.

The reference exposes an extensible map of named custom funcs invoked
from declarative schemas (``customfuncs/customFuncs.go:13-27``,
reflection invoke ``transform/invokeCustomFunc.go:10-68``). Here the
same contract is a registry of **column-expression builders** — each
returns a ``pyspark.sql.Column`` so Catalyst sees through them
(codegen, CSE, pushdown) — plus registered vectorized pandas UDFs as
the escape hatch (the analogue of the ``javascript`` custom func,
``extensions/omniv21/customfuncs/javascript.go``).
"""

from omniparser_spark.functions.registry import FunctionRegistry, default_registry  # noqa: F401
