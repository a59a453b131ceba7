"""URL canonicalization — the normalize-before-dedup step for web crawls.

The same page is crawled as ``HTTPS://Site.com:443/a/?utm_source=x#top``
and ``https://site.com/a`` — exact URL dedup and host grouping need one
canonical form.  Rules (applied in order, all vectorized Arrow RE2
kernels — no per-row Python):

  1. drop the fragment (``#...``);
  2. lowercase scheme + authority (path/query case preserved);
  3. strip default ports (``:443`` for https, ``:80`` for http);
  4. remove tracking query params (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``) — iterated to a fixed point, so any number of adjacent
     tracking params is removed and the transform is idempotent;
  5. drop an emptied ``?`` and repair ``?&``;
  6. strip trailing path slashes (also just before ``?``).

Strings without a ``scheme://authority`` prefix pass through unchanged.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TRACK = r"(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)"
_SPLIT = r"^(?P<head>[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(urls) -> pa.Array:
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    u = pc.cast(urls, pa.large_string())
    # split FIRST: every transform below applies only to recognized URLs,
    # so non-URL strings (null head) pass through truly unchanged
    parts = pc.extract_regex(u, _SPLIT)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(head, r"^(https://[^:/]*):443$", r"\1")
    head = pc.replace_substring_regex(head, r"^(http://[^:/]*):80$", r"\1")
    rest = pc.struct_field(parts, "rest")
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    # iterate to an ACTUAL fixed point: RE2's global replace resumes
    # after each consumed '&', so N adjacent tracking params need up to
    # ~N/2 passes; loop until the column stops changing
    for _ in range(32):
        nxt = pc.replace_substring_regex(
            rest, r"([?&])" + _TRACK + r"=[^&]*&", r"\1")
        nxt = pc.replace_substring_regex(
            nxt, r"[?&]" + _TRACK + r"=[^&]*$", "")
        done = pc.all(pc.equal(nxt, rest)).as_py()
        rest = nxt
        if done or done is None:  # None: all-null column
            break
    rest = pc.replace_substring_regex(rest, r"\?&", "?")
    rest = pc.replace_substring_regex(rest, r"\?$", "")
    rest = pc.replace_substring_regex(rest, r"/+\?", "?")
    rest = pc.replace_substring_regex(rest, r"/+$", "")
    joined = pc.binary_join_element_wise(
        head, rest, pa.scalar("", pa.large_string())
    )
    # non-URL strings (no scheme://authority): leave untouched
    return pc.coalesce(joined, u)
