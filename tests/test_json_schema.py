"""General JSON-vs-schema conformance (functions/json_schema).

Mirrors the reference's dynamic-message tests
(dynamic-message/tests/dynamic_message_tests.rs:21-152: valid population,
type mismatch, unknown field) and extends over every kind arm of
dynamic-message/src/lib.rs:22-247.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from data_quality_check_ray.functions.json_schema import (
    SchemaRegistry,
    compile_schema,
    validate_json_batch,
)

SPEC = {
    "fields": {
        "d": {"kind": "double"},
        "i32": {"kind": "int32"},
        "i64": {"kind": "int64"},
        "u32": {"kind": "uint32"},
        "u64": {"kind": "uint64"},
        "b": {"kind": "bool"},
        "s": {"kind": "string"},
        "by": {"kind": "bytes"},
        "e": {"kind": "enum", "values": ["RED", "GREEN"]},
        "m": {"kind": "message", "fields": {"x": {"kind": "int32"}}},
        "r": {"kind": "int64", "repeated": True},
    }
}


@pytest.fixture(scope="module")
def v():
    return compile_schema(SPEC)


def test_valid_document_all_arms(v):
    doc = {"d": 1.5, "i32": -5, "i64": 1 << 40, "u32": 7, "u64": 1 << 60,
           "b": True, "s": "x", "by": "abc", "e": "RED", "m": {"x": 3},
           "r": [1, 2, 3]}
    assert v(doc) == ""


def test_missing_fields_are_valid(v):
    # proto3 presence: the reference only iterates present fields
    assert v({}) == ""
    assert v({"s": "just one"}) == ""


def test_unknown_field(v):
    # "Field '{}' not found in descriptor" (lib.rs:249-251)
    assert v({"nope": 1}) == "unknown_field:nope"


def test_non_object(v):
    # "Expected a JSON object" (lib.rs:253-255)
    assert v([1, 2]) == "expected_object"
    assert v("str") == "expected_object"


@pytest.mark.parametrize("field,bad", [
    ("d", "x"), ("d", True),            # bool must not satisfy numeric
    ("i32", 1.5), ("i32", 1 << 40),     # fractional / out of range
    ("i64", "9"), ("i64", 1 << 63),
    ("u32", -1), ("u32", 1 << 32),
    ("u64", -1), ("u64", True),
    ("b", 1), ("b", "true"),            # int/string must not satisfy bool
    ("s", 5), ("by", 0),
    ("m", 5), ("m", [1]),
])
def test_type_mismatch(v, field, bad):
    assert v({field: bad}) == f"type_mismatch:{field}"


def test_enum_arms(v):
    assert v({"e": "GREEN"}) == ""
    assert v({"e": "BLUE"}) == "bad_enum:e"       # lib.rs:204-208
    assert v({"e": 1}) == "type_mismatch:e"       # must be a string name


def test_nested_message_recursion(v):
    assert v({"m": {"x": "bad"}}) == "type_mismatch:m.x"
    assert v({"m": {"y": 1}}) == "unknown_field:m.y"


def test_repeated_arm(v):
    assert v({"r": []}) == ""
    assert v({"r": 5}) == "type_mismatch:r"          # scalar where list due
    assert v({"r": [1, "x"]}) == "type_mismatch:r"   # element kind checked


def test_validate_json_batch(v):
    texts = pa.array([
        json.dumps({"s": "ok"}),
        "{not json",
        None,
        json.dumps([1]),
        json.dumps({"i32": "bad"}),
    ])
    valid, reason = validate_json_batch(texts, v)
    assert valid.to_pylist() == [True, False, False, False, False]
    assert reason.to_pylist() == [
        "", "invalid_json", "invalid_json", "expected_object",
        "type_mismatch:i32",
    ]


def test_registry_runtime_and_file(tmp_path):
    reg = SchemaRegistry()
    reg.register("t", {"fields": {"a": {"kind": "bool"}}})
    assert reg.get("t")({"a": True}) == ""
    # config-file loading: new schemas without a code change
    p = tmp_path / "doc.json"
    p.write_text(json.dumps(
        {"name": "doc", "fields": {"id": {"kind": "uint64"}}}))
    name = reg.register_file(str(p))
    assert name == "doc"
    assert reg.get("doc")({"id": 1}) == ""
    assert reg.get("doc")({"id": -1}) == "type_mismatch:id"
    assert reg.names() == ["doc", "t"]


def test_bad_specs_rejected():
    with pytest.raises(ValueError):
        compile_schema({"fields": {"x": {"kind": "nope"}}})
    with pytest.raises(ValueError):
        compile_schema({"fields": {"e": {"kind": "enum"}}})
    with pytest.raises(ValueError):
        compile_schema({})


def test_registry_counts_validations_per_schema_name():
    """Reference parity: the validation counter is dimensioned by schema
    (message) name — json_validation.rs:44-60."""
    reg = SchemaRegistry()
    reg.register("A", {"fields": {"x": {"kind": "uint64", "required": True}}})
    reg.register("B", {"fields": {"y": {"kind": "string"}}})
    valid, _ = reg.validate_batch("A", ['{"x": 1}', '{"x": "no"}', None])
    assert valid.to_pylist() == [True, False, False]
    reg.validate_batch("B", ['{"y": "ok"}'])
    c = reg.counters()
    assert c["A"] == {"valid": 1, "invalid": 2}
    assert c["B"] == {"valid": 1, "invalid": 0}
