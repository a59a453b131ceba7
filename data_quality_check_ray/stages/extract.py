"""HTML -> text extraction, byte-deterministic (the per-url invariant).

The analog of the reference's ``unescape_json`` normalization
(``data-quality-server/src/json_validation.rs:151-163``): a pure-bytes,
locale-independent decode step applied before validation.  Implemented as a
chain of vectorized Arrow kernels (RE2 ``extract_regex`` + literal
``replace_substring``) — no Python row loop.

``extract_text_array(wrap_html(text)) == text`` for every generated page
(see sources/synth.py); golden-tested byte-identical per url.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_MAIN_RE = r"(?s)<main><p>(?P<t>.*)</p></main>"


def extract_text_array(html: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """binary html -> large_string extracted text (null where html is null
    or has no <main> element)."""
    s = pc.cast(html, pa.large_string())
    inner = pc.struct_field(pc.extract_regex(s, _MAIN_RE), "t")
    inner = pc.replace_substring(inner, "</p>\n<p>", "\n")
    inner = pc.replace_substring(inner, "&lt;", "<")
    inner = pc.replace_substring(inner, "&gt;", ">")
    inner = pc.replace_substring(inner, "&amp;", "&")
    return inner


def extract_stage(batch: pa.Table) -> pa.Table:
    """map_batches stage: append ``text_effective`` (extracted text, falling
    back to the pre-extracted ``text`` column when html is null) and drop the
    heavy ``html`` column immediately (early projection, SURVEY.md §4.1)."""
    extracted = extract_text_array(batch["html"])
    effective = pc.coalesce(extracted, pc.cast(batch["text"], pa.large_string()))
    batch = batch.append_column("text_effective", effective)
    return batch.drop_columns(["html"])
