"""Property-based tests (hypothesis): the engine's vectorized kernels must
agree with the pinned scalar spec on ARBITRARY text, not just generator
output (SURVEY.md §5.2 property tests)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from data_quality_check_ray.functions import langid_model, lm
from data_quality_check_ray.functions.pii import scrub_batch, scrub_scalar
from data_quality_check_ray.functions.textstats import text_stats
from data_quality_check_ray.pipelines.reference_rules import extract_text_scalar
from data_quality_check_ray.sources.synth import wrap_html
from data_quality_check_ray.stages.extract import extract_text_array

# text without the private wrap markers (the generator never emits '<')
plain_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="<"),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(plain_text)
def test_extract_inverts_wrap_for_any_text(t):
    html = wrap_html(t, "h.example.org")
    out = extract_text_array(pa.array([html], type=pa.binary()))[0].as_py()
    assert out == t
    assert extract_text_scalar(html) == t


@settings(max_examples=150, deadline=None)
@given(st.lists(plain_text, min_size=1, max_size=8))
def test_text_stats_matches_python_spec(texts):
    arr = pa.array(texts, type=pa.large_string())
    stats = text_stats(arr)
    for i, t in enumerate(texts):
        words = t.split()
        assert stats["n_chars"][i] == len(t)
        assert stats["n_words"][i] == len(words)
        if words:
            assert stats["mean_word_len"][i] == sum(len(w) for w in words) / len(words)
        bigrams = list(zip(words, words[1:]))
        expect_dup = 1.0 - len(set(bigrams)) / len(bigrams) if bigrams else 0.0
        assert stats["dup2gram_fraction"][i] == expect_dup


@settings(max_examples=100, deadline=None)
@given(st.lists(plain_text, min_size=1, max_size=6))
def test_langid_and_ppl_scalar_equal_vectorized(texts):
    arr = pa.array(texts, type=pa.large_string())
    preds, scores = langid_model.langid_scores(arr)
    ppl = lm.ppl_batch(arr)
    for i, t in enumerate(texts):
        p, s = langid_model.score_scalar(t)
        assert preds[i] == p
        assert scores[i] == s
        assert ppl[i] == lm.ppl_scalar(t)


@settings(max_examples=100, deadline=None)
@given(st.lists(plain_text, min_size=1, max_size=6))
def test_scrub_parity_arbitrary_text(texts):
    arr = pa.array(texts, type=pa.large_string())
    scrubbed, counts, tox = scrub_batch(arr)
    for i, t in enumerate(texts):
        s, c, tx = scrub_scalar(t)
        assert scrubbed[i].as_py() == s
        assert tox[i] == tx
        for k in c:
            assert counts[k][i] == c[k]


@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)), min_size=1, max_size=4
    ),
    st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_bmp_ppm_stream_roundtrip_property(shapes, seed):
    """Any (h, w) sequence round-trips bit-exactly through BMP, PPM and
    the PPM stream codec (row padding, header parsing)."""
    import numpy as np

    from data_quality_check_ray.functions import codecs

    rs = np.random.RandomState(seed % (2**32))
    frames = [rs.randint(0, 256, (h, w, 3), dtype=np.uint8) for h, w in shapes]
    for f in frames:
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(f)), f)
        assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(f)), f)
    back = list(codecs.iter_ppm_stream(codecs.encode_ppm_stream(frames)))
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


@given(st.integers(1, 10_000), st.integers(0, 2**31))
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, seed):
    import numpy as np

    from data_quality_check_ray.functions import codecs

    s = np.random.RandomState(seed % (2**32)).randint(
        -32768, 32767, n).astype(np.int16)
    rate, ch, out = codecs.decode_wav(codecs.encode_wav_pcm16(s, 44100))
    assert rate == 44100 and ch == 1 and np.array_equal(out, s)


@given(st.text(max_size=60))
@settings(max_examples=80, deadline=None)
def test_url_canonicalization_idempotent_property(s):
    """c(c(x)) == c(x) for arbitrary strings (URLs or not)."""
    import pyarrow as pa

    from data_quality_check_ray.functions.urls import canonicalize_urls

    once = canonicalize_urls(pa.array([s], type=pa.string())).to_pylist()[0]
    twice = canonicalize_urls(pa.array([once], type=pa.string())).to_pylist()[0]
    assert twice == once


@given(st.lists(st.floats(0, 1e9, allow_nan=False), min_size=1, max_size=500),
       st.integers(1, 5))
@settings(max_examples=30, deadline=None)
def test_qhist_merge_equals_whole_property(values, n_chunks):
    import numpy as np

    from data_quality_check_ray.functions.sketches import (
        qhist_from_values,
        qhist_merge,
    )

    x = np.array(values)
    whole = qhist_from_values(x)
    parts = [qhist_from_values(c) for c in np.array_split(x, n_chunks)]
    assert np.array_equal(qhist_merge(parts), whole)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.one_of(plain_text, st.none()), min_size=1, max_size=6))
def test_shingle_kernel_matches_per_occurrence_reference(texts):
    """The dictionary-factored shingle kernel (decontam._shingle_hash_full)
    must equal a direct per-occurrence implementation on arbitrary text:
    same digests, same owning rows, same window starts, original-case
    tokens preserved.  (Both sides lower via arrow utf8_lower so the test
    pins the FACTORING, not the case-mapping convention.)"""
    import pandas as pd
    import pyarrow.compute as pc

    from data_quality_check_ray.stages.decontam import _shingle_hash_full

    k = 3
    h, rows, starts, words, woff = _shingle_hash_full(
        pa.array(texts, type=pa.string()), k)

    flat, exp_h, exp_rows, exp_starts = [], [], [], []
    pos = 0
    P = np.uint64(1099511628211)
    for i, t in enumerate(texts):
        ws = (t or "").split(" ")
        lw = [pc.utf8_lower(pa.scalar(w)).as_py() for w in ws]
        flat.extend(ws)
        if len(ws) >= k:
            wh = pd.util.hash_array(np.array(lw, dtype=object))
            for j in range(len(ws) - k + 1):
                acc = wh[j]
                for m in range(1, k):
                    acc = acc * P + wh[j + m]
                exp_h.append(np.int64(acc >> np.uint64(1)))
                exp_rows.append(i)
                exp_starts.append(pos + j)
        pos += len(ws)

    assert words.to_pylist() == flat
    assert list(np.diff(woff)) == [len((t or "").split(" ")) for t in texts]
    np.testing.assert_array_equal(h, np.array(exp_h, dtype=np.int64))
    np.testing.assert_array_equal(rows, np.array(exp_rows, dtype=np.int64))
    np.testing.assert_array_equal(starts,
                                  np.array(exp_starts, dtype=np.int64))
