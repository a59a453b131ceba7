"""URL canonicalization kernel (functions/urls)."""

from __future__ import annotations

import pyarrow as pa

from data_quality_check_ray.functions.urls import canonicalize_urls


def c(u: str) -> str:
    return canonicalize_urls(pa.array([u])).to_pylist()[0]


def test_case_port_fragment():
    assert c("HTTPS://WWW.Example.COM:443/Path/To?x=1#frag") == \
        "https://www.example.com/Path/To?x=1"
    assert c("HTTP://Host.org:80/a") == "http://host.org/a"
    # non-default ports survive
    assert c("https://h.org:8443/a") == "https://h.org:8443/a"


def test_path_case_preserved():
    assert c("https://h.org/CaseSensitive/Path") == \
        "https://h.org/CaseSensitive/Path"


def test_tracking_params():
    assert c("https://h.org/a?utm_source=x&id=5&fbclid=Y") == \
        "https://h.org/a?id=5"
    # adjacent tracking params (fixed-point passes)
    assert c("https://h.org/a?utm_a=1&utm_b=2&gclid=3&id=5") == \
        "https://h.org/a?id=5"
    # all params tracking -> '?' dropped entirely
    assert c("https://h.org/a?utm_source=x&fbclid=2") == "https://h.org/a"
    # tracking in the middle
    assert c("https://h.org/a?id=1&utm_x=9&z=2") == "https://h.org/a?id=1&z=2"


def test_trailing_slashes():
    assert c("https://h.org/a/b/") == "https://h.org/a/b"
    assert c("https://h.org/a//?x=1") == "https://h.org/a?x=1"
    assert c("https://h.org/") == "https://h.org"


def test_non_urls_pass_through():
    assert c("not a url at all") == "not a url at all"
    assert c("") == ""
    assert canonicalize_urls(pa.array([None], type=pa.string())).to_pylist() == [None]


def test_idempotent():
    dirty = "HTTPS://A.B:443/x/?utm_s=1&q=2#f"
    once = c(dirty)
    assert c(once) == once


def test_non_url_with_hash_untouched():
    """Regression: fragment stripping must not mutate non-URL strings."""
    assert c("anchor #1 see notes") == "anchor #1 see notes"
    # fragment directly after authority (no path)
    assert c("https://H.org#frag") == "https://h.org"


def test_many_adjacent_tracking_params_fixed_point():
    """Regression: RE2 global replace resumes after each consumed '&';
    the loop must reach an actual fixed point for ANY adjacency run."""
    dirty = "https://h.org/a?" + "&".join(f"utm_{ch}={n}" for n, ch in
                                          enumerate("abcdefgh")) + "&id=5"
    assert c(dirty) == "https://h.org/a?id=5"
    assert c(c(dirty)) == c(dirty)
