"""Pages table schema + validity domains.

The analog of the reference's protobuf descriptor pool
(``data-quality-server/src/protobuf_descriptors.rs:98-121``): the schema is a
*static, versioned* ``pyarrow.Schema`` constant compiled once at import — the
reference rebuilds its DescriptorPool per request, an anti-pattern this engine
deliberately avoids (SURVEY.md §4.1).

Input shape fixed by BASELINE.json ``input_hint``:
    url:string (non-null key), warc_ts:timestamp[us], html:binary,
    text:large_string, lang:string
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input schema (the "descriptor")
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=True),
        pa.field("html", pa.binary(), nullable=True),
        pa.field("text", pa.large_string(), nullable=True),
        pa.field("lang", pa.string(), nullable=True),
    ]
)

#: Columns that must exist for a batch to be structurally valid.  An extra,
#: unknown column is a violation — the analog of the reference's
#: "Field '{}' not found in descriptor" (dynamic-message/src/lib.rs:249-251).
REQUIRED_COLUMNS = tuple(PAGES_SCHEMA.names)

# ---------------------------------------------------------------------------
# Value domains
# ---------------------------------------------------------------------------

#: ISO-639-1 codes accepted in the claimed ``lang`` column (null also allowed).
VALID_LANG_CODES = frozenset(
    """aa ab af am ar as ay az ba be bg bn bo br bs ca co cs cy da de dz el en
    eo es et eu fa fi fj fo fr fy ga gd gl gn gu ha he hi hr hu hy ia id ie ik
    is it iu ja jv ka kk kl km kn ko ks ku ky la lb ln lo lt lv mg mi mk ml mn
    mr ms mt my na ne nl no oc om or pa pl ps pt qu rm rn ro ru rw sa sd sg si
    sk sl sm sn so sq sr ss st su sv sw ta te tg th ti tk tl tn to tr ts tt tw
    ug uk ur uz vi vo wo xh yi yo za zh zu""".split()
)

#: Languages the pipeline will *keep* (the langid model's classes).
ALLOWED_LANGS = ("en", "de", "fr", "es", "nl")

# ---------------------------------------------------------------------------
# Output columns appended by the pipeline
# ---------------------------------------------------------------------------

OUTPUT_COLUMNS = (
    "keep",          # bool — final decision
    "drop_reason",   # string — first failing rule, "" when kept
    "lang_pred",     # string — langid prediction
    "lang_score",    # float32 — langid confidence
    "ppl",           # float32 — LM perplexity
    "text_scrubbed", # large_string — PII-scrubbed effective text
)


def conforming_table(batch: pa.Table, schema: pa.Schema | None = None) -> pa.Table:
    """Cast a batch to the schema's column order/types (round-trip analog of
    ``serialize_dynamic_message``, dynamic-message/src/lib.rs:261-282).

    Raises on unknown columns — batch-level structural violation.
    ``schema`` defaults to the built-in PAGES_SCHEMA; pass a config-loaded
    schema (``load_schema_file``) to validate a different table shape
    without a code change.
    """
    schema = schema or PAGES_SCHEMA
    names = schema.names
    extra = [c for c in batch.column_names if c not in names]
    if extra:
        raise ValueError(f"unknown columns not in pages schema: {extra}")
    missing = [c for c in names if c not in batch.column_names]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    return batch.select(list(names)).cast(schema)


# ---------------------------------------------------------------------------
# config-file-loaded schemas (runtime-extensible, SURVEY.md §2.9)
# ---------------------------------------------------------------------------

#: JSON type names accepted in schema config files -> Arrow types.  The
#: moral equivalent of the reference's descriptor upload
#: (data-quality-server/src/handlers.rs:27-78): a NEW table shape becomes
#: validatable by shipping a config file, not code.
_ARROW_TYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "bool": pa.bool_(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32": pa.date32(),
}


def schema_from_spec(spec: dict) -> pa.Schema:
    """{'fields': [{'name': ..., 'type': ..., 'nullable': true}, ...]}
    -> pyarrow.Schema.  ``type`` may be any key of ``_ARROW_TYPES`` or
    ``list<T>`` for a list column (e.g. ``list<float32>`` embeddings)."""
    fields = spec.get("fields")
    if not isinstance(fields, list) or not fields:
        raise ValueError("schema spec needs a non-empty 'fields' list")
    out = []
    for f in fields:
        name, tname = f.get("name"), f.get("type")
        if not name or not tname:
            raise ValueError(f"schema field needs 'name' and 'type': {f}")
        if tname.startswith("list<") and tname.endswith(">"):
            inner = tname[5:-1]
            if inner not in _ARROW_TYPES:
                raise ValueError(f"field '{name}': unknown list item type {inner!r}")
            t = pa.list_(_ARROW_TYPES[inner])
        elif tname in _ARROW_TYPES:
            t = _ARROW_TYPES[tname]
        else:
            raise ValueError(f"field '{name}': unknown type {tname!r}")
        out.append(pa.field(name, t, nullable=bool(f.get("nullable", True))))
    return pa.schema(out)


def load_schema_file(path: str) -> pa.Schema:
    """JSON schema config file -> pyarrow.Schema."""
    import json

    with open(path) as f:
        return schema_from_spec(json.load(f))
