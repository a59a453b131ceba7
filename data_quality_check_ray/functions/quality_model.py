"""Pinned fastText-style quality classifier (hashed word n-grams).

Model-based quality filtering in the DCLM / CCNet spirit (PAPERS.md):
score = sigmoid(TEMP * mean of per-feature weights), where features are
hashed word unigrams plus adjacent-word bigrams — the fastText
featurization (Joulin et al., 2017) applied to the quality-vs-junk
decision instead of language ID.

The weight table is a PINNED DETERMINISTIC artifact, built closed-form:
a seeded splitmix64 mixer fills the residual weights (standing in for
offline-trained values — real deployments drop trained weights into the
same table; training is out of scope for the engine, exactly as the
fastText langid weights are pinned in langid_model.py), then two
interpretable adjustments make the score a genuine quality signal on
any corpus: stop-word buckets get a positive boost (stopword density is
the classic fluent-prose proxy, Gopher §A1) and toxicity-term buckets a
strong negative one.

Two scoring paths, bit-identical by construction (the langid_model
pattern, engine vs pinned spec):

  * ``score_scalar_qc`` — obviously-correct row-at-a-time Python, used
    by the differential oracle (pipelines/oracle_refs);
  * ``qc_scores`` — the vectorized engine path: per-word hashing runs
    over the UNIQUE word dictionary only and gathers by code (the
    textstats dictionary-factoring lever), bigram ids come from one
    shifted-array multiply, and per-doc sums use the same sequential
    float32 reduce (segment_sum_sequential32) the spec uses.

Both consume the same weight table; parity is in the featurization and
accumulation order, mirroring how the reference proves validity through
an independent second path (dynamic-message/src/lib.rs:261-282).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.wordlists import STOPWORDS, TOXICITY_TERMS
from .segments import segment_sum_sequential32
from .textstats import as_single_array, split_words

B = 1 << 16          # feature hash buckets
BIGRAM_MULT = 1000003
SEED = 0x51_AB_17    # pinned artifact identity
#: sigmoid temperature: per-feature weights are ~uniform[-1,1), so the
#: feature mean is O(1/sqrt(n_feat)); TEMP spreads clean docs away from
#: the 0.5 decision boundary.
TEMP = 8.0
KEEP_THRESHOLD = np.float32(0.5)

_M64 = (1 << 64) - 1


def word_bucket_scalar(word: str) -> int:
    """Per-word feature id: byte-wise polynomial hash, mod B each step
    (the per-step mod keeps the vectorized int64 path exact)."""
    h = 0
    for byte in word.encode("utf-8"):
        h = (h * 31 + byte) % B
    return h


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


@lru_cache(maxsize=1)
def build_qc_weights() -> np.ndarray:
    """(B,) float32 pinned weight table (shared by spec and engine)."""
    with np.errstate(over="ignore"):
        z = _splitmix64(np.arange(B, dtype=np.uint64) + np.uint64(SEED))
    w = (((z >> np.uint64(11)).astype(np.float64) * 2.0 ** -53) * 2.0
         - 1.0).astype(np.float32)
    # interpretable closed-form adjustments, applied in sorted order so
    # bucket collisions accumulate identically on every build
    for sw in sorted(STOPWORDS):
        w[word_bucket_scalar(sw)] += np.float32(0.75)
    for term in sorted(TOXICITY_TERMS):
        w[word_bucket_scalar(term)] += np.float32(-3.0)
    w.setflags(write=False)
    return w


@lru_cache(maxsize=1)
def load_trained_qc_weights() -> np.ndarray:
    """(B,) float32 TRAINED weight table — the committed artifact from
    ``scripts/train_qc_weights.py`` (deterministic full-batch Adagrad
    logistic regression on the synthetic pages corpus, labeled by the
    pipeline's own rule decisions; held-out AUC in the parquet
    metadata).  Proves the "trained weights drop into the same table"
    contract: both scoring paths accept it interchangeably with the
    closed-form table."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts",
        "qc_weights_trained.parquet")
    w = pq.read_table(path)["w"].to_numpy().astype(np.float32)
    if len(w) != B:
        raise ValueError(f"trained weight table has {len(w)} buckets, "
                         f"expected {B}")
    w.setflags(write=False)
    return w


def _score_from_sums(total32: np.ndarray, n_feat: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(float32 sums, int feature counts) -> (qc_score f32, qc_keep bool).

    Zero-feature docs score 0.0 / drop."""
    n = len(n_feat)
    score = np.zeros(n, dtype=np.float32)
    nz = n_feat > 0
    if nz.any():
        mean = total32[nz].astype(np.float64) / n_feat[nz]
        score[nz] = (1.0 / (1.0 + np.exp(-TEMP * mean))).astype(np.float32)
    return score, score >= KEEP_THRESHOLD


def lower_simple(s: str) -> str:
    """Per-codepoint SIMPLE lowercase — the pinned spec's case rule,
    matching utf8proc/Arrow (non-contextual: final sigma stays σ) rather
    than Python str.lower (full casing: SpecialCasing İ -> i+combining
    dot, contextual final sigma).  U+0130 is the only multi-char full
    LOWERCASE mapping in SpecialCasing.txt; its simple mapping is 'i'."""
    return "".join("i" if c == "İ" else c.lower() for c in s)


def score_scalar_qc(text: str | None,
                    weights: np.ndarray | None = None
                    ) -> tuple[np.float32, bool]:
    """Pinned-spec path: score one document (``weights`` defaults to the
    closed-form table; pass ``load_trained_qc_weights()`` for the
    trained artifact)."""
    w = weights if weights is not None else build_qc_weights()
    toks = [lower_simple(t) for t in (text or "").split()]
    uni = np.array([word_bucket_scalar(t) for t in toks], dtype=np.int64)
    big = (uni[:-1] * BIGRAM_MULT + uni[1:]) % B if len(uni) > 1 else \
        np.empty(0, dtype=np.int64)
    if not len(uni):
        return np.float32(0.0), False
    s_uni = np.add.reduceat(w[uni], np.array([0]))[0]
    s_big = (np.add.reduceat(w[big], np.array([0]))[0] if len(big)
             else np.float32(0.0))
    total32 = np.float32(s_uni) + np.float32(s_big)
    score, keep = _score_from_sums(
        np.array([total32], dtype=np.float32),
        np.array([len(uni) + len(big)], dtype=np.int64))
    return score[0], bool(keep[0])


def _hash_dictionary(dictionary: pa.Array) -> np.ndarray:
    """Vectorized word_bucket over the UNIQUE words: iterate byte
    POSITIONS (bounded by the longest word), not words."""
    from .langid_model import _flat_utf8

    d = as_single_array(pc.cast(dictionary, pa.large_string()))
    if len(d) == 0:
        return np.empty(0, dtype=np.int64)
    flat, off = _flat_utf8(d)
    lens = np.diff(off)
    h = np.zeros(len(d), dtype=np.int64)
    flat64 = flat.astype(np.int64)
    for p in range(int(lens.max()) if len(lens) else 0):
        m = lens > p
        h[m] = (h[m] * 31 + flat64[off[:-1][m] + p]) % B
    return h


def featurize_batch(texts: pa.ChunkedArray | pa.Array):
    """Shared vectorized featurization -> (uni, woff, big, boff).

    ``uni``/``big`` are hashed feature ids (token order preserved),
    ``woff``/``boff`` the per-doc segment offsets into them.  Used by
    ``qc_scores`` and by the DSIR stage (stages/dsir.py) so both share
    one pinned feature identity."""
    arr = as_single_array(texts)
    arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    # split FIRST, lower the unique-word DICTIONARY after (the tokenize()
    # convention): tokens are identical either way (no case mapping adds
    # or removes whitespace), lower runs over the vocabulary instead of
    # the token stream, and it sidesteps a reproducible pyarrow-16.1
    # quirk where utf8_split_whitespace misreads utf8_lower output under
    # memory-pool buffer reuse (trailing whitespace kept inside a token;
    # found by the hypothesis parity suite in tests/test_quality_model.py)
    wvals, woff = split_words(arr)
    n = len(woff) - 1
    n_words = np.diff(woff)

    wdct = as_single_array(wvals).dictionary_encode()
    codes = np.asarray(wdct.indices, dtype=np.int64)
    dhash = _hash_dictionary(pc.utf8_lower(wdct.dictionary))
    uni = dhash[codes] if len(codes) else np.empty(0, dtype=np.int64)

    # adjacent-pair bigrams, never across document boundaries: token
    # position p pairs with p+1 iff p is not the last token of its doc
    if len(uni) > 1:
        not_last = np.ones(len(uni) - 1, dtype=bool)
        ends = woff[1:-1] - 1  # positions ending each non-final doc;
        # empty leading docs yield -1, and an empty FINAL doc makes an
        # earlier doc's end equal total-1 (no pair starts there anyway) —
        # keep only in-range pair starts, never wrap
        ends = ends[(ends >= 0) & (ends < len(uni) - 1)]
        not_last[ends] = False
        big = ((uni[:-1] * BIGRAM_MULT + uni[1:]) % B)[not_last]
    else:
        big = np.empty(0, dtype=np.int64)
    n_big = np.maximum(n_words - 1, 0)
    boff = np.concatenate([[0], np.cumsum(n_big)]).astype(np.int64)
    return uni, woff.astype(np.int64), big, boff


def qc_scores(texts: pa.ChunkedArray | pa.Array,
              weights: np.ndarray | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized batch scorer -> (qc_score f32[n], qc_keep bool[n]).
    ``weights`` as in ``score_scalar_qc``."""
    w = weights if weights is not None else build_qc_weights()
    uni, woff, big, boff = featurize_batch(texts)
    n_words, n_big = np.diff(woff), np.diff(boff)
    s_uni = segment_sum_sequential32(w[uni], woff)
    s_big = segment_sum_sequential32(w[big], boff)
    total32 = s_uni.astype(np.float32) + s_big.astype(np.float32)
    return _score_from_sums(total32, n_words + n_big)
