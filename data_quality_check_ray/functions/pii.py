"""PII / toxicity regex bank.

Patterns are written in the common subset of RE2 (pyarrow.compute's regex
engine) and Python ``re`` — ASCII digit classes ``[0-9]`` (never ``\\d``,
which is unicode-wide in Python), no backrefs/lookarounds — so the
vectorized engine (``pc.replace_substring_regex``) and the pinned scalar
spec (``re.sub``) produce byte-identical scrubbed text.

Compiled once per worker at import (module-level) — the fix for the
reference's per-request instrument/pool rebuilds (SURVEY.md §4.1).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.wordlists import TOXICITY_TERMS

#: ordered scrub rules: (name, pattern, replacement) — order matters
#: (emails contain digits; phones before bare long ids).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,3} [0-9]{2,4} [0-9]{2,4} [0-9]{3,5}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("id_number", r"\b[0-9]{9,}\b", "<ID>"),
)

TOX_PATTERN = r"\b(?:" + "|".join(TOXICITY_TERMS) + r")\b"

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_RULES]
_TOX_COMPILED = re.compile(TOX_PATTERN)


def scrub_scalar(text: str) -> tuple[str, dict[str, int], int]:
    """Pinned-spec path: (scrubbed, per-kind counts, tox_count)."""
    counts: dict[str, int] = {}
    for name, rx, repl in _COMPILED:
        text, k = rx.subn(repl, text)
        counts[name] = k
    return text, counts, len(_TOX_COMPILED.findall(text))


def scrub_batch(texts: pa.ChunkedArray | pa.Array):
    """Vectorized scrub.

    -> (scrubbed: pa.Array[large_string] (nulls preserved),
        counts: dict[name, np.int64 array], tox_count: np.int64 array)
    """
    s = pc.cast(texts, pa.large_string())
    counts: dict[str, np.ndarray] = {}
    for name, pat, repl in PII_RULES:
        counts[name] = (
            pc.fill_null(pc.count_substring_regex(s, pat), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s = pc.replace_substring_regex(s, pat, repl)
    tox = (
        pc.fill_null(pc.count_substring_regex(s, TOX_PATTERN), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return s, counts, tox
