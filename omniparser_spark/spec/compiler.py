"""Mapping-spec compiler: omniparser ``transform_declarations`` re-imagined.

The reference validates a JSON schema document at load time, resolves
each declaration to a *kind*, expands templates with circular-reference
detection, content-hashes each decl for runtime result caching, then
walks the decl tree per record (``transform/validate.go:25-42``,
``transform/decl.go:14-23,142-161``, ``transform/parse.go``).

Here the same declarative language compiles **once** into a single
Spark ``Column`` expression tree over a decoded payload struct — the
per-record interpreter disappears; Catalyst codegens the whole mapping
and the cluster executes it at scan speed. Template re-use maps to
shared Column sub-expressions (Catalyst CSE takes care of evaluating a
subtree once per row — the engine-side analogue of the reference's
``(node.ID, decl.hash)`` result cache, ``transform/parse.go:15-53``).

Decl kinds (reference ``transform/decl.go:14-23``):

    const        {"const": "literal"}
    external     {"external": "property_name"}
    field/path   {"path": "a.b.c"}            (xpath -> dotted struct path)
    object       {"object": {name: decl, ...}, "path": optional anchor}
    array        {"array": [decl, ...]}       (heterogeneous children concat)
    map_each     {"map_each": decl, "path": array_anchor}
                                              (MatchAll over an array field --
                                               the columnar form of the
                                               multi-match xpath in array
                                               decls, transform/parse.go:220-251)
    custom_func  {"custom_func": {"name": n, "args": [decl...],
                                  "ignore_error": bool}}
    template     {"template": "decl_name"}

Scalar modifiers (any kind): "type": int|float|boolean|string
(cast matrix ``transform/value.go:21-82``), "no_trim": bool
(``value.go:84-89``), "keep_empty_or_null": bool (``value.go:90-116``).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from omniparser_spark.functions.registry import FunctionRegistry, default_registry

KINDS = (
    "const",
    "external",
    "path",
    "object",
    "array",
    "map_each",
    "custom_func",
    "template",
)

_CAST_TYPES = {
    "int": "long",
    "float": "double",
    "boolean": "boolean",
    "string": "string",
}


class SpecError(ValueError):
    """Schema-spec validation failure (pre-flight, driver-side)."""


# ----------------------------------------------------------------- validate

def decl_hash(decl: dict[str, Any]) -> str:
    """Stable content hash of a decl (reference transform/validate.go:217-259)."""
    return hashlib.md5(
        json.dumps(decl, sort_keys=True).encode()
    ).hexdigest()


def _decl_kind(decl: dict[str, Any], where: str) -> str:
    kinds = [k for k in KINDS if k in decl]
    if "path" in decl and any(k in decl for k in ("object", "array", "map_each")):
        kinds = [k for k in kinds if k != "path"]  # path is the anchor here
    if len(kinds) != 1:
        raise SpecError(
            f"{where}: decl must have exactly one kind of {KINDS}, got {kinds}"
        )
    return kinds[0]


def validate_spec(spec: dict[str, Any]) -> None:
    """Pre-flight validation (the engine-side analogue of the reference's
    JSON-Schema gate + ValidateTransformDeclarations)."""
    if not isinstance(spec, dict):
        raise SpecError("spec must be a dict")
    decls = spec.get("transform_declarations")
    if not isinstance(decls, dict) or "FINAL_OUTPUT" not in decls:
        raise SpecError(
            "transform_declarations with a FINAL_OUTPUT root is required "
            "(reference transform/decl.go:36-40)"
        )

    def walk(decl: Any, where: str, stack: tuple[str, ...]) -> None:
        if not isinstance(decl, dict):
            raise SpecError(f"{where}: decl must be an object, got {type(decl)}")
        kind = _decl_kind(decl, where)
        if "type" in decl and decl["type"] not in _CAST_TYPES:
            raise SpecError(
                f"{where}: unsupported type {decl['type']!r}; "
                f"valid: {sorted(_CAST_TYPES)}"
            )
        if kind == "template":
            name = decl["template"]
            if name not in decls:
                raise SpecError(f"{where}: unknown template {name!r}")
            if name in stack:
                raise SpecError(
                    f"{where}: circular template reference "
                    f"{' -> '.join(stack + (name,))} "
                    "(reference transform/validate.go:183-215)"
                )
            walk(decls[name], f"template {name}", stack + (name,))
        elif kind == "object":
            for child_name, child in decl["object"].items():
                walk(child, f"{where}.{child_name}", stack)
        elif kind == "array":
            if not isinstance(decl["array"], list):
                raise SpecError(f"{where}: array decl takes a list")
            for i, child in enumerate(decl["array"]):
                walk(child, f"{where}[{i}]", stack)
        elif kind == "map_each":
            if "path" not in decl:
                raise SpecError(f"{where}: map_each requires an array 'path' anchor")
            walk(decl["map_each"], f"{where}.map_each", stack)
        elif kind == "custom_func":
            cf = decl["custom_func"]
            if not isinstance(cf, dict) or "name" not in cf:
                raise SpecError(f"{where}: custom_func needs {{name, args}}")
            for i, a in enumerate(cf.get("args", [])):
                walk(a, f"{where}.args[{i}]", stack)

    walk(decls["FINAL_OUTPUT"], "FINAL_OUTPUT", ("FINAL_OUTPUT",))


# ------------------------------------------------------------------ compile

def _resolve_path(anchor: Column, path: str) -> Column:
    """Dotted path relative to the current anchor ('.' = the anchor
    itself) — the columnar form of relative xpath extraction
    (reference transform/parse.go:156-165)."""
    if path in (".", ""):
        return anchor
    out = anchor
    for part in path.split("."):
        out = out.getField(part)
    return out


def _apply_modifiers(col: Column, decl: dict[str, Any]) -> Column:
    """Scalar cast/trim/prune policies. Untyped decls pass through with
    their native Spark type (the reference is string-until-cast because
    its IDR is untyped; a typed columnar engine need not round-trip)."""
    t = decl.get("type")
    if t is None:
        return col
    if t == "string":
        col = col.cast("string")
        if not decl.get("no_trim", False):
            # default trim (reference transform/value.go:84-89)
            col = F.trim(col)
        if not decl.get("keep_empty_or_null", False):
            # empty/null pruning default (value.go:90-116)
            col = F.nullif(col, F.lit(""))
        return col
    src = col.cast("string")
    if not decl.get("no_trim", False):
        src = F.trim(src)
    target = _CAST_TYPES[t]
    if target == "long":
        # float->int truncation semantics (value.go:56-64): parse as
        # double first, truncate toward zero; bad parse -> NULL
        # (continuable error, errs/errs.go:12-25)
        return src.try_cast("double").cast("long")
    return src.try_cast(target)


def compile_decl(
    decl: dict[str, Any],
    anchor: Column,
    decls: dict[str, Any],
    registry: FunctionRegistry,
    externals: dict[str, str],
) -> Column:
    kind = _decl_kind(decl, "compile")
    if kind == "const":
        return _apply_modifiers(F.lit(decl["const"]), decl)
    if kind == "external":
        name = decl["external"]
        if name not in externals:
            raise SpecError(
                f"external property {name!r} not supplied "
                "(reference transformctx/ctx.go:8-30)"
            )
        return _apply_modifiers(F.lit(externals[name]), decl)
    if kind == "path":
        return _apply_modifiers(_resolve_path(anchor, decl["path"]), decl)
    if kind == "object":
        obj_anchor = (
            _resolve_path(anchor, decl["path"]) if "path" in decl else anchor
        )
        fields = [
            compile_decl(child, obj_anchor, decls, registry, externals).alias(name)
            for name, child in decl["object"].items()
        ]
        return F.struct(*fields)
    if kind == "array":
        parts = [
            compile_decl(child, anchor, decls, registry, externals)
            for child in decl["array"]
        ]
        return F.array(*parts)
    if kind == "map_each":
        arr = _resolve_path(anchor, decl["path"])
        inner = decl["map_each"]
        return F.transform(
            arr,
            lambda el: compile_decl(inner, el, decls, registry, externals),
        )
    if kind == "custom_func":
        cf = decl["custom_func"]
        args = [
            compile_decl(a, anchor, decls, registry, externals)
            for a in cf.get("args", [])
        ]
        col = registry.build(
            cf["name"], *args, ignore_error=cf.get("ignore_error", False)
        )
        return _apply_modifiers(col, decl)
    if kind == "template":
        return compile_decl(
            decls[decl["template"]], anchor, decls, registry, externals
        )
    raise SpecError(f"unhandled kind {kind}")  # pragma: no cover


def compile_spec(
    spec: dict[str, Any],
    anchor: Column,
    registry: FunctionRegistry | None = None,
    externals: dict[str, str] | None = None,
) -> Column:
    """Validate + compile FINAL_OUTPUT into one Column over `anchor`."""
    validate_spec(spec)
    return compile_decl(
        spec["transform_declarations"]["FINAL_OUTPUT"],
        anchor,
        spec["transform_declarations"],
        registry or default_registry(),
        externals or {},
    )


def apply_spec(
    df: DataFrame,
    spec: dict[str, Any],
    anchor_col: str,
    registry: FunctionRegistry | None = None,
    externals: dict[str, str] | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Apply a mapping spec to a DataFrame's decoded payload struct.

    With flatten=True (FINAL_OUTPUT is an object) the result columns are
    the object's fields — the canonical output-record shape.
    """
    out = compile_spec(spec, F.col(anchor_col), registry, externals)
    df = df.withColumn("_spec_out", out)
    if flatten:
        return df.select("_spec_out.*")
    return df.withColumnRenamed("_spec_out", "record")
