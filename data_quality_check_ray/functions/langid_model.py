"""Deterministic fastText-style language-ID model (char byte-trigrams).

A linear bag-of-character-n-grams classifier in the spirit of fastText
(Joulin et al., 2017, PAPERS.md), built *closed-form* from the package's own
word lists — no RNG, no external artifacts, identical on every
build/worker/process.  The model is the per-actor pinned state of the
``LangIdStage`` actor pool (the anti-pattern fix for the reference's
per-request descriptor-pool rebuild, handlers.rs:113-123 / SURVEY.md §4.1).

Scoring: per document, the mean log-likelihood per trigram under each
language's smoothed trigram distribution, softmax-normalized; the winning
class is ``lang_pred`` and its softmax probability is ``lang_score``
(float32, thresholded by the decision stage).

Two trigram extractors exist on purpose:
  * ``trigram_ids_scalar`` — obviously-correct Python loop, used by the
    pinned scalar spec (pipelines/reference_rules.py);
  * ``_window_ids`` — vectorized numpy over the flattened utf-8 buffer,
    used by the engine.
Both feed the same summation (np.add.reduceat) and softmax, so engine and
spec agree bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import ALLOWED_LANGS
from ..sources.wordlists import WORDLISTS
from .segments import segment_sum_sequential32

V = 4096  # trigram hash buckets
UNKNOWN_LANG = "und"
#: scoring samples every 3rd window start (non-overlapping trigrams cover
#: every byte once) — 3x less gather/reduce memory traffic per document
#: with negligible accuracy change; training stays dense (stride 1).
#: Part of the pinned spec: the scalar path samples identically.
SAMPLE_STRIDE = 3
#: softmax temperature over per-trigram mean loglik: clean single-language
#: docs have a ~0.4-0.6 nat gap between best and runner-up (=> score ≈ 1),
#: mixed-language docs ~0.03 (=> score ≈ 0.5, below the 0.65 gate).
SCORE_TEMP = 15.0


def _tri_id(b0: int, b1: int, b2: int) -> int:
    return ((b0 * 31 + b1) * 31 + b2) % V


def trigram_ids_scalar(text_lower: str, stride: int = 1) -> list[int]:
    """Reference-path trigram extraction: pure Python over utf-8 bytes."""
    b = text_lower.encode("utf-8")
    return [_tri_id(b[i], b[i + 1], b[i + 2]) for i in range(0, len(b) - 2, stride)]


@lru_cache(maxsize=1)
def build_logprob() -> np.ndarray:
    """(V, n_langs) float32 log P(trigram | lang), add-one smoothed.

    Trained closed-form: each vocabulary word ``w`` of a language contributes
    the trigrams of ``" w "`` with count 1 — exactly the expected trigram
    profile of the uniform-word generator in sources/synth.py.

    float32 on purpose: the scoring gather/reduce writes ~5 floats per
    input byte, so table precision is the dominant memory-bandwidth lever
    at 32 concurrent actors; both the engine and the pinned scalar spec
    consume the same table with the same reduce order, so parity holds.
    """
    counts = np.zeros((V, len(ALLOWED_LANGS)), dtype=np.float64)
    for li, lang in enumerate(ALLOWED_LANGS):
        for w in WORDLISTS[lang]:
            for tid in trigram_ids_scalar(f" {w.lower()} "):
                counts[tid, li] += 1.0
    totals = counts.sum(axis=0, keepdims=True)
    return np.log((counts + 1.0) / (totals + V)).astype(np.float32)


def softmax_scores(sums: np.ndarray, n_windows: np.ndarray):
    """(n, L) per-lang loglik sums + (n,) window counts ->
    (lang_pred: object ndarray, lang_score: float32 ndarray).

    Zero-window docs get (UNKNOWN_LANG, 0.0).
    """
    n = len(n_windows)
    preds = np.full(n, UNKNOWN_LANG, dtype=object)
    scores = np.zeros(n, dtype=np.float32)
    nz = n_windows > 0
    if nz.any():
        avg = (sums[nz] / n_windows[nz, None]) * SCORE_TEMP
        m = avg.max(axis=1, keepdims=True)
        e = np.exp(avg - m)
        p = e / e.sum(axis=1, keepdims=True)
        idx = p.argmax(axis=1)
        preds[nz] = np.array(ALLOWED_LANGS, dtype=object)[idx]
        scores[nz] = p[np.arange(p.shape[0]), idx].astype(np.float32)
    return preds, scores


def score_scalar(text: str) -> tuple[str, np.float32]:
    """Pinned-spec path: score one document."""
    logprob = build_logprob()
    ids = trigram_ids_scalar(text.lower(), stride=SAMPLE_STRIDE)
    if not ids:
        return UNKNOWN_LANG, np.float32(0.0)
    M = logprob[np.asarray(ids, dtype=np.int64)]
    # float32 reduceat then exact widening — identical op order/dtype to the
    # engine's segment_sum_sequential32
    sums = np.vstack([
        np.add.reduceat(M[:, li], np.array([0])).astype(np.float64)
        for li in range(len(ALLOWED_LANGS))
    ]).T  # shape (1, L)
    preds, scores = softmax_scores(sums, np.array([len(ids)], dtype=np.int64))
    return str(preds[0]), scores[0]


def _flat_utf8(texts: pa.Array):
    """large_string array -> (bytes: np.uint8, offsets: np.int64) rebased."""
    arr = texts
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    b = data[offs[0] : offs[-1]]
    return b, (offs - offs[0]).astype(np.int64)


def langid_scores(texts: pa.ChunkedArray | pa.Array):
    """Vectorized batch scorer.  Nulls -> (UNKNOWN_LANG, 0.0)."""
    from .textstats import as_single_array

    logprob = build_logprob()
    arr = as_single_array(texts)
    arr = pc.fill_null(pc.cast(arr, pa.large_string()), "")
    arr = pc.utf8_lower(arr)
    arr = as_single_array(arr)
    b, offs = _flat_utf8(arr)
    n = len(offs) - 1
    lens = np.diff(offs)
    # sampled window counts: ceil(max(len-2,0) / STRIDE) per doc
    dense = np.maximum(lens - 2, 0)
    win_counts = (dense + SAMPLE_STRIDE - 1) // SAMPLE_STRIDE
    woff = np.concatenate([[0], np.cumsum(win_counts)]).astype(np.int64)
    total = int(woff[-1])

    if total == 0:
        return softmax_scores(
            np.zeros((n, len(ALLOWED_LANGS))), np.zeros(n, dtype=np.int64)
        )

    # sampled start positions: offs[d] + STRIDE*k, built segment-wise
    # without any per-byte array
    starts_rep = np.repeat(offs[:-1], win_counts)
    k = np.arange(total, dtype=np.int64) - np.repeat(woff[:-1], win_counts)
    P = starts_rep + k * SAMPLE_STRIDE

    b32 = b.astype(np.int32)
    ids = ((b32[P] * 31 + b32[P + 1]) * 31 + b32[P + 2]) % V

    sums = np.empty((n, len(ALLOWED_LANGS)), dtype=np.float64)
    for li in range(len(ALLOWED_LANGS)):
        # float32 gather + sequential reduce (same order/dtype as the
        # scalar spec path)
        sums[:, li] = segment_sum_sequential32(logprob[:, li][ids], woff)
    return softmax_scores(sums, win_counts)
