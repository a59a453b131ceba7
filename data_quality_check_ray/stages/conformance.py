"""Schema conformance as a vectorized batch predicate.

The reference validates one JSON document per request against a protobuf
descriptor and *fails the request* on the first bad field
(``dynamic-message/src/lib.rs:11-258``: unknown field / type mismatch /
non-object => Err).  At 10^12 rows the engine must instead **mark** rows and
never fail the job (SURVEY.md §1.4): same decision semantics, dataset-friendly
error channel — a ``conform_reason`` column, "" when the row conforms.

Checks (ordered; first failing wins, mirroring the reference's fail-fast):
    conform:null_url    url null/empty              (key column, lib.rs:253-255 analog)
    conform:null_ts     warc_ts null
    conform:no_content  effective text null/empty   (nothing to validate)
    conform:bad_lang    claimed lang not a known ISO-639-1 code (null allowed)

Structural (batch-level) validation — unknown extra column, wrong Arrow type
— is handled by ``schema.conforming_table`` at the read boundary, the analog
of "Field '{}' not found in descriptor" (lib.rs:249-251).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import VALID_LANG_CODES

_LANG_DOMAIN = pa.array(sorted(VALID_LANG_CODES), type=pa.string())


def conformance_stage(batch: pa.Table) -> pa.Table:
    """Append ``conform_reason`` (string, "" = conforming).

    Expects ``text_effective`` (added by the extract stage).
    """
    url = batch["url"]
    null_url = pc.or_kleene(
        pc.is_null(url), pc.equal(pc.coalesce(url, ""), "")
    )
    null_ts = pc.is_null(batch["warc_ts"])
    text = batch["text_effective"]
    no_content = pc.or_kleene(
        pc.is_null(text), pc.equal(pc.coalesce(text, pa.scalar("", pa.large_string())), "")
    )
    lang = batch["lang"]
    bad_lang = pc.and_kleene(
        pc.is_valid(lang), pc.invert(pc.is_in(lang, value_set=_LANG_DOMAIN))
    )

    # build reason by applying checks in REVERSE priority so earlier checks
    # overwrite later ones
    reason = pa.nulls(len(batch), pa.string())
    reason = pc.if_else(bad_lang, "conform:bad_lang", reason)
    reason = pc.if_else(no_content, "conform:no_content", reason)
    reason = pc.if_else(null_ts, "conform:null_ts", reason)
    reason = pc.if_else(null_url, "conform:null_url", reason)
    reason = pc.coalesce(reason, "")
    return batch.append_column("conform_reason", reason)
