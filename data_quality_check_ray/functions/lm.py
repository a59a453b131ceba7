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


def bigram_logp(h1: np.ndarray, h2: np.ndarray, tables=None) -> np.ndarray:
    """Vectorized logP(w2|w1) for hashed token id arrays.  ``tables``
    overrides the closed-form package tables with corpus-trained ones
    (``train_tables``)."""
    uni, pair = tables if tables is not None else build_tables()
    return np.log(
        (pair[_pair_slot(h1.astype(np.int64), h2.astype(np.int64))] + ALPHA)
        / (uni[h1] + ALPHA * H)
    )


def _bigram_slots_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Batch -> (h1 unigram ids of bigram heads, pair slots) — the shared
    counting kernel of training and scoring (same tokenize + hash path as
    ppl_batch, so a trained model scores exactly what it counted)."""
    from .textstats import tokenize

    _, _, woff, (wdct, norm_dict) = tokenize(texts)
    uniq_hash = np.array([token_hash(t) for t in norm_dict.to_pylist()],
                         dtype=np.int64)
    codes = np.asarray(wdct.indices, dtype=np.int64)
    th = uniq_hash[codes] if len(codes) else np.empty(0, dtype=np.int64)
    if len(th) < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    row_ids = row_ids_from_offsets(woff)
    same_row = row_ids[:-1] == row_ids[1:]
    h1 = th[:-1][same_row]
    h2 = th[1:][same_row]
    return h1, _pair_slot(h1, h2)


def train_tables(ds, text_col: str = "text"):
    """Distributed KenLM-style counting: -> (uni float64[H], pair
    float64[PAIR_M]) trained on a Dataset's text column.

    Shape: per-batch sparse partial counts over hashed slots (np.unique —
    vectorized, no Python per token) -> TWO-LEVEL tree combine: partials
    coalesce into a bounded set of combiner tasks (each sparse-reduces
    its share), then one final merge of at most that many
    already-reduced partials — no single task or the driver ever ingests
    one partial per block.  Integer sums are associative, so the tree is
    bit-identical to a flat fold.
    """
    import pyarrow as pa_

    def partial(b: pa_.Table) -> pa_.Table:
        h1, slots = _bigram_slots_batch(b[text_col])
        u, uc = np.unique(h1, return_counts=True)
        p, pc_ = np.unique(slots, return_counts=True)
        return pa_.table({
            "kind": np.concatenate([np.zeros(len(u), np.int8),
                                    np.ones(len(p), np.int8)]),
            "slot": np.concatenate([u, p]),
            "c": np.concatenate([uc, pc_]).astype(np.int64),
        })

    def group_sum(t: pa_.Table) -> pa_.Table:
        g = t.group_by(["kind", "slot"]).aggregate([("c", "sum")])
        # select by NAME before the positional rename: pyarrow's column
        # order for group_by results (keys first vs aggregates first)
        # varies across versions, and a silent kind/slot/c swap would
        # corrupt the trained LM tables with no error
        return g.select(["kind", "slot", "c_sum"]).rename_columns(
            ["kind", "slot", "c"])

    combined = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(64)
        .map_batches(group_sum, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(group_sum, batch_format="pyarrow", batch_size=None)
    )
    t = pa.concat_tables(
        combined.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    kind = t["kind"].to_numpy(zero_copy_only=False)
    slot = t["slot"].to_numpy(zero_copy_only=False)
    c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
    uni = np.zeros(H, dtype=np.float64)
    pair = np.zeros(PAIR_M, dtype=np.float64)
    uni[slot[kind == 0]] = c[kind == 0]
    pair[slot[kind == 1]] = c[kind == 1]
    return uni, pair


def ppl_scalar(text: str) -> np.float32:
    """Pinned-spec path: perplexity of one document (pure-Python tokenize)."""
    toks = [normalize_token(t) for t in text.split()]
    if len(toks) < 2:
        return PPL_SENTINEL
    hs = np.array([token_hash(t) for t in toks], dtype=np.int64)
    lp = bigram_logp(hs[:-1], hs[1:])
    mean = np.add.reduceat(lp, np.array([0]))[0] / len(lp)
    return np.float32(np.exp(-mean))


def ppl_batch(texts: pa.ChunkedArray | pa.Array, pre=None,
              tables=None) -> np.ndarray:
    """Vectorized batch perplexity -> float32[n].

    ``pre`` is an optional ``textstats.tokenize(...)`` result (shared
    tokenization in the fused model stage); ``tables`` optionally scores
    with corpus-trained counts (``train_tables``) instead of the pinned
    closed-form model."""
    from .textstats import tokenize

    _, _, woff, (wdct, norm_dict) = (
        pre if pre is not None else tokenize(texts)
    )
    n = len(woff) - 1

    # hash only the unique tokens (vocabulary is tiny vs corpus) — over
    # the shared normalized dictionary, no second dictionary_encode
    uniq_hash = np.array([token_hash(t) for t in norm_dict.to_pylist()],
                         dtype=np.int64)
    codes = np.asarray(wdct.indices, dtype=np.int64)
    th = uniq_hash[codes] if len(codes) else np.empty(0, dtype=np.int64)

    n_words = np.diff(woff)
    out = np.full(n, PPL_SENTINEL, dtype=np.float32)
    if len(th) < 2:
        return out

    row_ids = row_ids_from_offsets(woff)
    same_row = row_ids[:-1] == row_ids[1:]
    if not same_row.any():
        return out
    lp_all = bigram_logp(th[:-1][same_row], th[1:][same_row], tables=tables)
    bg_counts = np.maximum(n_words - 1, 0)
    bgoff = np.concatenate([[0], np.cumsum(bg_counts)]).astype(np.int64)
    sums = segment_sum_sequential(lp_all, bgoff)
    nz = bg_counts > 0
    out[nz] = np.exp(-(sums[nz] / bg_counts[nz])).astype(np.float32)
    return out
