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


def conforming_table(batch: pa.Table) -> pa.Table:
    """Cast a batch to PAGES_SCHEMA column order/types (round-trip analog of
    ``serialize_dynamic_message``, dynamic-message/src/lib.rs:261-282).

    Raises on unknown columns — batch-level structural violation.
    """
    extra = [c for c in batch.column_names if c not in REQUIRED_COLUMNS]
    if extra:
        raise ValueError(f"unknown columns not in pages schema: {extra}")
    missing = [c for c in REQUIRED_COLUMNS if c not in batch.column_names]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
    return batch.select(list(REQUIRED_COLUMNS)).cast(PAGES_SCHEMA)
