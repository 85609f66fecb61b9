"""Mapping-spec compiler tests: every decl kind, modifiers, validation
errors, template reuse — mirroring the reference's transform tests
(transform/parse_test.go, transform/validate_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omniparser_spark.spec import SpecError, apply_spec, compile_spec, validate_spec


@pytest.fixture(scope="module")
def payload_df(spark):
    data = [
        (
            1,
            (
                "conv_7",
                " 3 ",
                {"role": "assistant", "text": "  hi there  ", "score": "4.9"},
                ["a", "b", "c"],
                "",
            ),
        ),
        (
            2,
            (
                "conv_9",
                "nope",
                {"role": "user", "text": "", "score": "x"},
                [],
                "tool_x",
            ),
        ),
    ]
    schema = (
        "id int, payload struct<conv:string, idx:string, "
        "turn:struct<role:string, text:string, score:string>, "
        "tags:array<string>, tool:string>"
    )
    return spark.createDataFrame(data, schema)


def test_all_decl_kinds(spark, payload_df):
    spec = {
        "transform_declarations": {
            "FINAL_OUTPUT": {
                "object": {
                    "conv_id": {"path": "conv"},
                    "turn_idx": {"path": "idx", "type": "int"},
                    "role": {"path": "turn.role"},
                    "text": {"path": "turn.text", "type": "string"},
                    "text_raw": {
                        "path": "turn.text",
                        "type": "string",
                        "no_trim": True,
                        "keep_empty_or_null": True,
                    },
                    "score": {"path": "turn.score", "type": "float"},
                    "src": {"const": "feed-1"},
                    "env": {"external": "filename"},
                    "tool": {"path": "tool", "type": "string"},
                    "pair": {"array": [{"path": "conv"}, {"const": "k"}]},
                    "tags_up": {
                        "path": "tags",
                        "map_each": {"custom_func": {"name": "upper", "args": []}},
                    },
                    "shout": {
                        "custom_func": {
                            "name": "concat",
                            "args": [{"path": "turn.role"}, {"const": "!"}],
                        }
                    },
                    "who": {"template": "WHO"},
                }
            },
            "WHO": {"custom_func": {"name": "upper", "args": [{"path": "turn.role"}]}},
        }
    }
    # map_each custom funcs receive the element as implicit arg when
    # args is empty? no — make upper explicit over the element:
    spec["transform_declarations"]["FINAL_OUTPUT"]["object"]["tags_up"] = {
        "path": "tags",
        "map_each": {"custom_func": {"name": "upper", "args": [{"path": "."}]}},
    }
    out = apply_spec(
        payload_df, spec, "payload", externals={"filename": "in.jsonl"}
    )
    rows = {r["conv_id"]: r for r in out.collect()}
    r1 = rows["conv_7"]
    assert r1["turn_idx"] == 3  # trimmed " 3 " -> 3
    assert r1["text"] == "hi there"  # default trim
    assert r1["text_raw"] == "  hi there  "  # no_trim + keep empty
    assert r1["score"] == 4.9
    assert r1["src"] == "feed-1"
    assert r1["env"] == "in.jsonl"
    assert r1["tool"] is None  # '' pruned to NULL
    assert r1["pair"] == ["conv_7", "k"]
    assert r1["tags_up"] == ["A", "B", "C"]
    assert r1["shout"] == "assistant!"
    assert r1["who"] == "ASSISTANT"

    r2 = rows["conv_9"]
    assert r2["turn_idx"] is None  # continuable cast failure -> NULL
    assert r2["score"] is None
    assert r2["text"] is None  # empty pruned
    assert r2["tool"] == "tool_x"


def test_float_to_int_truncation(spark, payload_df):
    spec = {
        "transform_declarations": {
            "FINAL_OUTPUT": {
                "object": {"s": {"path": "turn.score", "type": "int"}}
            }
        }
    }
    out = apply_spec(payload_df, spec, "payload")
    vals = sorted(r["s"] for r in out.collect() if r["s"] is not None)
    assert vals == [4]  # 4.9 truncates toward zero (value.go:56-64)


def test_validation_errors(spark):
    with pytest.raises(SpecError, match="FINAL_OUTPUT"):
        validate_spec({"transform_declarations": {}})
    with pytest.raises(SpecError, match="exactly one kind"):
        validate_spec(
            {"transform_declarations": {"FINAL_OUTPUT": {"const": "a", "external": "b"}}}
        )
    with pytest.raises(SpecError, match="circular"):
        validate_spec(
            {
                "transform_declarations": {
                    "FINAL_OUTPUT": {"template": "A"},
                    "A": {"template": "B"},
                    "B": {"template": "A"},
                }
            }
        )
    with pytest.raises(SpecError, match="unknown template"):
        validate_spec(
            {"transform_declarations": {"FINAL_OUTPUT": {"template": "NOPE"}}}
        )
    with pytest.raises(SpecError, match="unsupported type"):
        validate_spec(
            {
                "transform_declarations": {
                    "FINAL_OUTPUT": {"path": "x", "type": "decimal"}
                }
            }
        )


def test_missing_external(spark, payload_df):
    spec = {
        "transform_declarations": {
            "FINAL_OUTPUT": {"object": {"e": {"external": "nope"}}}
        }
    }
    with pytest.raises(SpecError, match="external property"):
        compile_spec(spec, F.col("payload"))


def test_unknown_custom_func(spark, payload_df):
    spec = {
        "transform_declarations": {
            "FINAL_OUTPUT": {
                "object": {
                    "x": {"custom_func": {"name": "zzz", "args": []}}
                }
            }
        }
    }
    with pytest.raises(KeyError, match="zzz"):
        compile_spec(spec, F.col("payload"))
