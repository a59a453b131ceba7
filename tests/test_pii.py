"""PII/toxicity scrub: RE2 (vectorized) vs Python re (scalar) parity."""

from __future__ import annotations

import pyarrow as pa

from data_quality_check_ray.functions.pii import scrub_batch, scrub_scalar
from data_quality_check_ray.sources import synth

CASES = [
    "contact user42@mail7.example.com today",
    "call +49 301 555 1234 or +1 800 555 0100 now",
    "server at 192.168.001.042 and 10.0.0.1 responded",
    "id 1234567890123 shipped; short 12345678 stays",
    "mixed: a@b.co 1.2.3.4 +33 12 345 6789 99999999999",
    "the noxweed and grimspit terms appear; vilethorngrim stays",
    "no pii here at all",
    "",
]


def test_scrub_scalar_equals_vectorized():
    arr = pa.array(CASES, type=pa.large_string())
    scrubbed, counts, tox = scrub_batch(arr)
    for i, t in enumerate(CASES):
        s, c, tx = scrub_scalar(t)
        assert scrubbed[i].as_py() == s, (i, scrubbed[i].as_py(), s)
        for k in c:
            assert counts[k][i] == c[k], (i, k)
        assert tox[i] == tx, i


def test_scrub_replacements():
    s, c, tox = scrub_scalar(CASES[0])
    assert "<EMAIL>" in s and c["email"] == 1
    s, c, _ = scrub_scalar(CASES[2])
    assert s.count("<IP>") == 2
    s, c, _ = scrub_scalar(CASES[3])
    assert "<ID>" in s and "12345678 stays" in s
    _, _, tox = scrub_scalar(CASES[5])
    assert tox == 2  # word-boundary match only


def test_scrub_on_synth_pii_stratum():
    t = synth.generate_table(1000)
    scrubbed, counts, tox = scrub_batch(t["text"])
    n_pii = 0
    for i in range(len(t)):
        if 84 <= i % 100 < 90:  # PII carrier stratum
            total = sum(int(counts[k][i]) for k in counts)
            assert total >= 1, i
            n_pii += 1
            # scalar parity on the scrubbed bytes
            s, _, _ = scrub_scalar(t["text"][i].as_py())
            assert scrubbed[i].as_py() == s
    assert n_pii == 60
