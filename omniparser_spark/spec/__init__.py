"""Declarative mapping specs compiled to Spark column expressions."""

from omniparser_spark.spec.compiler import (  # noqa: F401
    SpecError,
    compile_spec,
    apply_spec,
    validate_spec,
)
