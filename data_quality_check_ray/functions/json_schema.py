"""General JSON-vs-schema conformance: the reference's dynamic-message
validation recast as a batch operator.

The reference walks one JSON document against a protobuf MessageDescriptor
and fails on the first bad field (``dynamic-message/src/lib.rs:11-258``):
every scalar kind (double/float, sint/int/fixed 32/64, uint/fixed 32/64,
bool, string, bytes), enum-by-name (lib.rs:191-221) and nested messages
recursively (lib.rs:222-247); unknown fields are errors (lib.rs:249-251)
and non-objects are rejected (lib.rs:253-255).  This module provides the
same decision table over a column of JSON strings, engine-style: rows are
MARKED with a reason instead of failing the job, and schemas are plain
data (dict / JSON file) so new message types can be registered at runtime
— the moral equivalent of the reference's descriptor-upload handler
(``data-quality-server/src/handlers.rs:27-78``) without a protobuf
dependency.

Reason strings (stable API, "" = conforming; first failing field wins and
fields are checked in schema order):

    invalid_json              unparseable document
    expected_object           top-level JSON is not an object
    unknown_field:<path>      field not in the schema (descriptor miss)
    type_mismatch:<path>      value does not fit the declared kind
    bad_enum:<path>           string not among the enum's named values

Schema spec (JSON-serializable; ``repeated`` wraps any kind, mirroring
protobuf repeated fields):

    {"fields": {
        "id":    {"kind": "uint64"},
        "lang":  {"kind": "enum", "values": ["en", "de"]},
        "flags": {"kind": "message", "fields": {"pii": {"kind": "bool"}}},
        "tags":  {"kind": "string", "repeated": true}}}

Missing fields are valid (proto3 presence semantics — the reference only
iterates fields present in the document).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

_I32 = 1 << 31
_I64 = 1 << 63
_U32 = 1 << 32
_U64 = 1 << 64

SCALAR_KINDS = {
    "double", "float", "int32", "int64", "uint32", "uint64",
    "bool", "string", "bytes",
}


def _scalar_ok(kind: str, v) -> bool:
    # bool is a subclass of int in Python: exclude it from numeric kinds
    # explicitly (JSON true must NOT satisfy an int32 field)
    if kind in ("double", "float"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if kind == "int32":
        return isinstance(v, int) and not isinstance(v, bool) and -_I32 <= v < _I32
    if kind == "int64":
        return isinstance(v, int) and not isinstance(v, bool) and -_I64 <= v < _I64
    if kind == "uint32":
        return isinstance(v, int) and not isinstance(v, bool) and 0 <= v < _U32
    if kind == "uint64":
        return isinstance(v, int) and not isinstance(v, bool) and 0 <= v < _U64
    if kind == "bool":
        return isinstance(v, bool)
    if kind in ("string", "bytes"):
        # the reference accepts a JSON string for bytes too (lib.rs:168-190)
        return isinstance(v, str)
    raise ValueError(f"unknown scalar kind: {kind}")


def compile_schema(spec: dict):
    """Compile a schema spec into ``validate(obj) -> reason`` ("" = ok).

    Compilation resolves the kind table once; per-document validation is
    then pure dict-walking — do this in an actor's ``__init__`` and reuse
    across batches.
    """
    fields = spec.get("fields")
    if not isinstance(fields, dict):
        raise ValueError("schema spec needs a 'fields' dict")

    compiled: list[tuple[str, dict, object]] = []
    for name, f in fields.items():
        kind = f.get("kind")
        if kind == "enum":
            values = frozenset(f.get("values", ()))
            if not values:
                raise ValueError(f"enum field '{name}' needs 'values'")
            compiled.append((name, f, values))
        elif kind == "message":
            compiled.append((name, f, compile_schema(f)))
        elif kind in SCALAR_KINDS:
            compiled.append((name, f, None))
        else:
            raise ValueError(f"field '{name}': unknown kind {kind!r}")
    known = frozenset(fields)

    def validate(obj, path: str = "") -> str:
        if not isinstance(obj, dict):
            return "expected_object"
        for k in obj:
            if k not in known:
                return f"unknown_field:{path}{k}"
        for name, f, aux in compiled:
            if name not in obj:
                continue  # absent fields are valid (proto3 presence)
            v = obj[name]
            p = f"{path}{name}"
            vals = [v]
            if f.get("repeated"):
                if not isinstance(v, list):
                    return f"type_mismatch:{p}"
                vals = v
            kind = f["kind"]
            for item in vals:
                if kind == "enum":
                    if not isinstance(item, str):
                        return f"type_mismatch:{p}"
                    if item not in aux:
                        return f"bad_enum:{p}"
                elif kind == "message":
                    if not isinstance(item, dict):
                        return f"type_mismatch:{p}"
                    r = aux(item, path=p + ".")
                    if r:
                        return r
                elif not _scalar_ok(kind, item):
                    return f"type_mismatch:{p}"
        return ""

    return validate


def validate_json_batch(texts, validate) -> tuple[pa.Array, pa.Array]:
    """JSON-string column -> (valid: bool array, reason: string array).

    The parse is per-row by necessity (arbitrary nested JSON has no Arrow
    kernel); everything around it — the compiled validator, the output
    assembly — avoids per-row Python object churn.  Null input rows are
    invalid_json.
    """
    rows = texts.to_pylist() if hasattr(texts, "to_pylist") else texts
    reasons = []
    loads = json.loads
    for t in rows:
        if t is None:
            reasons.append("invalid_json")
            continue
        try:
            obj = loads(t)
        except (ValueError, TypeError):
            reasons.append("invalid_json")
            continue
        reasons.append(validate(obj))
    reason_arr = pa.array(reasons, type=pa.string())
    valid = pa.array(np.fromiter((r == "" for r in reasons), dtype=bool,
                                 count=len(reasons)))
    return valid, reason_arr


# ---------------------------------------------------------------------------
# runtime-extensible schema registry (config-file loaded)
# ---------------------------------------------------------------------------


class SchemaRegistry:
    """Named schemas, registrable at runtime or loaded from JSON files —
    the engine's answer to the reference's upload-a-descriptor endpoint
    (handlers.rs:27-78): new message types become validatable without a
    code change."""

    def __init__(self):
        self._specs: dict[str, dict] = {}
        self._compiled: dict[str, object] = {}
        # per-schema-name validation counters — the reference dimensions
        # its OTel counter by message_name (json_validation.rs:44-60).
        # Process-local like the reference's (per actor in distributed
        # use); snapshot with counters().
        self._counts: dict[str, dict[str, int]] = {}

    def register(self, name: str, spec: dict) -> None:
        self._compiled[name] = compile_schema(spec)  # validate eagerly
        self._specs[name] = spec
        self._counts.setdefault(name, {"valid": 0, "invalid": 0})

    def validate_batch(self, name: str, texts) -> tuple[pa.Array, pa.Array]:
        """Validate a JSON-string column against the named schema and
        count the outcomes under that schema name (the reference's
        per-message_name metric dimension)."""
        valid, reason = validate_json_batch(texts, self._compiled[name])
        c = self._counts.setdefault(name, {"valid": 0, "invalid": 0})
        n_valid = int(valid.to_numpy(zero_copy_only=False).sum())
        c["valid"] += n_valid
        c["invalid"] += len(valid) - n_valid
        return valid, reason

    def counters(self) -> dict[str, dict[str, int]]:
        """{schema_name: {valid, invalid}} snapshot."""
        return {k: dict(v) for k, v in self._counts.items()}

    def register_file(self, path: str) -> str:
        with open(path) as f:
            doc = json.load(f)
        name = doc.get("name")
        if not name:
            raise ValueError(f"{path}: schema file needs a 'name'")
        self.register(name, doc)
        return name

    def get(self, name: str):
        """-> compiled validator."""
        return self._compiled[name]

    def spec(self, name: str) -> dict:
        return self._specs[name]

    def names(self) -> list[str]:
        return sorted(self._specs)
