"""KenLM-style hashed word-bigram language model (CCNet-style ppl filter).

Deterministic, self-contained: counts are built *closed-form* from the
package word lists (the expected bigram profile of the uniform-word synth
generator — every same-language word pair has count 1), hashed into fixed
tables.  No RNG, no external artifacts; identical on every worker.

    logP(w2 | w1) = log( (C(w1,w2) + a) / (C(w1) + a * H) )
    ppl(doc)      = exp( - mean over bigrams of logP )

Token normalization (lower + strip ``.,!?;:``) matches the stop-word rule.
Docs with <2 tokens get ``PPL_SENTINEL`` (dropped by min_words anyway).

Engine path: arrow split -> dictionary-encode -> crc32 per *unique* token
(tiny) -> vectorized table lookups -> per-doc reduceat.  Pinned-spec path
(reference_rules.py) tokenizes and hashes per row in pure Python; both share
the hash tables and summation order.
"""

from __future__ import annotations

import zlib
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.wordlists import WORDLISTS
from .segments import row_ids_from_offsets, segment_sum_sequential
from .textstats import WORD_TRIM_CHARS

H = 1 << 16          # unigram hash space
PAIR_M = 1 << 20     # bigram hash table size
ALPHA = 0.01         # additive smoothing
PPL_SENTINEL = np.float32(999999.0)


def token_hash(token: str) -> int:
    return zlib.crc32(token.encode("utf-8")) % H


def _pair_slot(h1: np.ndarray | int, h2: np.ndarray | int):
    return (h1 * np.int64(1000003) + h2) % PAIR_M


def normalize_token(tok: str) -> str:
    return tok.lower().strip(WORD_TRIM_CHARS)


@lru_cache(maxsize=1)
def build_tables() -> tuple[np.ndarray, np.ndarray]:
    """-> (uni: float64[H], pair: float64[PAIR_M]) count tables."""
    uni = np.zeros(H, dtype=np.float64)
    pair = np.zeros(PAIR_M, dtype=np.float64)
    for words in WORDLISTS.values():
        hs = [token_hash(normalize_token(w)) for w in words]
        for h1 in hs:
            uni[h1] += len(hs)  # each w1 pairs with every vocab word once
            for h2 in hs:
                pair[_pair_slot(h1, h2)] += 1.0
    return uni, pair


def bigram_logp(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized logP(w2|w1) for hashed token id arrays."""
    uni, pair = build_tables()
    return np.log(
        (pair[_pair_slot(h1.astype(np.int64), h2.astype(np.int64))] + ALPHA)
        / (uni[h1] + ALPHA * H)
    )


def ppl_scalar(text: str) -> np.float32:
    """Pinned-spec path: perplexity of one document (pure-Python tokenize)."""
    toks = [normalize_token(t) for t in text.split()]
    if len(toks) < 2:
        return PPL_SENTINEL
    hs = np.array([token_hash(t) for t in toks], dtype=np.int64)
    lp = bigram_logp(hs[:-1], hs[1:])
    mean = np.add.reduceat(lp, np.array([0]))[0] / len(lp)
    return np.float32(np.exp(-mean))


def ppl_batch(texts: pa.ChunkedArray | pa.Array, pre=None) -> np.ndarray:
    """Vectorized batch perplexity -> float32[n].

    ``pre`` is an optional ``textstats.tokenize(...)`` result (shared
    tokenization in the fused model stage)."""
    from .textstats import tokenize

    _, _, woff, norm = pre if pre is not None else tokenize(texts)
    n = len(woff) - 1

    # hash only the unique tokens (vocabulary is tiny vs corpus)
    dct = norm.dictionary_encode()
    uniq = dct.dictionary.to_pylist()
    uniq_hash = np.array([token_hash(t) for t in uniq], dtype=np.int64)
    codes = np.asarray(dct.indices, dtype=np.int64)
    th = uniq_hash[codes] if len(codes) else np.empty(0, dtype=np.int64)

    n_words = np.diff(woff)
    out = np.full(n, PPL_SENTINEL, dtype=np.float32)
    if len(th) < 2:
        return out

    row_ids = row_ids_from_offsets(woff)
    same_row = row_ids[:-1] == row_ids[1:]
    if not same_row.any():
        return out
    lp_all = bigram_logp(th[:-1][same_row], th[1:][same_row])
    bg_counts = np.maximum(n_words - 1, 0)
    bgoff = np.concatenate([[0], np.cumsum(bg_counts)]).astype(np.int64)
    sums = segment_sum_sequential(lp_all, bgoff)
    nz = bg_counts > 0
    out[nz] = np.exp(-(sums[nz] / bg_counts[nz])).astype(np.float32)
    return out
