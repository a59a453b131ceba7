"""Vectorized text statistics (Gopher/C4-style heuristic signals).

All kernels are pyarrow.compute / numpy over flattened list values — no
Python row loops (the engine-wide rule; cf. the reference's per-request
whitespace tokenizers, dynamic-message/src/lib.rs:287-293, recast columnar).

Exact-arithmetic discipline: every per-row statistic is an integer count (or
ratio of integer counts with one final float division), so the vectorized
values match the pinned scalar spec in ``pipelines/reference_rules.py``
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.wordlists import STOPWORDS
from .segments import (
    list_to_numpy_segments,
    row_ids_from_offsets,
    segment_sum_exact,
)

#: punctuation stripped from word edges before stop-word lookup
WORD_TRIM_CHARS = ".,!?;:"

_STOPWORD_SET = pa.array(sorted(STOPWORDS), type=pa.large_string())


def as_single_array(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # older pyarrow returns 1-chunk CA
            col = col.chunk(0) if col.num_chunks else pa.array([], type=col.type)
    return col


def split_words(texts: pa.Array):
    """Whitespace-split with *Python str.split() semantics* (no empty
    tokens): arrow's ``utf8_split_whitespace`` emits empty edge tokens for
    leading/trailing whitespace — filter them out, rebuilding offsets.

    -> (values: pa.Array[str], offsets: np.int64[n+1])
    """
    words = pc.utf8_split_whitespace(texts)
    vals, off = list_to_numpy_segments(words)
    nonempty = pc.greater(pc.binary_length(vals), 0)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    if ne_np.all():  # fast path: no edge-whitespace tokens to strip
        return vals, off
    counts = segment_sum_exact(ne_np.astype(np.int64), off)
    new_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return vals.filter(nonempty), new_off


def _dup2gram_fraction(codes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row fraction of duplicate word-2-grams: 1 - unique/total
    (0.0 when a row has <2 words).

    Fully vectorized and EXACT (dictionary codes, not lossy hashes): the
    (row, code1, code2) triple is packed into one int64 sort key —
    single-key np.sort is ~16x faster than np.lexsort here — with a
    lexsort fallback if the packing could overflow."""
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    if len(codes) < 2:
        return out
    row_ids = row_ids_from_offsets(offsets)
    same_row = row_ids[:-1] == row_ids[1:]
    bg_row = row_ids[:-1][same_row]
    if not len(bg_row):
        return out
    base = int(codes.max()) + 1
    total = np.bincount(bg_row, minlength=n)
    # guard in PYTHON ints: base*base in int64 silently wraps past ~2^31
    # codes, which would corrupt the packed key while the guard still
    # passes (the whole packed key (n+1)*base^2 must fit in int64)
    if (int(n) + 1) * base * base < (1 << 62):  # exact packing fits in int64
        base = np.int64(base)
        base2 = base * base
        bg_hash = codes[:-1][same_row].astype(np.int64) * base + codes[1:][same_row]
        comb = np.sort(bg_row * base2 + bg_hash)
        new = np.ones(len(comb), dtype=bool)
        new[1:] = comb[1:] != comb[:-1]
        uniq = np.bincount((comb[new] // base2), minlength=n)
    else:  # pathological vocabulary size: exact three-key sort (the packed
        # bigram hash would wrap too, so sort the raw code pair)
        c1 = codes[:-1][same_row].astype(np.int64)
        c2 = codes[1:][same_row].astype(np.int64)
        order = np.lexsort((c2, c1, bg_row))
        sr, s1, s2 = bg_row[order], c1[order], c2[order]
        new = np.ones(len(sr), dtype=bool)
        new[1:] = (sr[1:] != sr[:-1]) | (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        uniq = np.bincount(sr[new], minlength=n)
    nz = total > 0
    out[nz] = 1.0 - uniq[nz] / total[nz]
    return out


def tokenize(texts: pa.ChunkedArray | pa.Array):
    """Shared tokenization: (filled_texts, word values, word offsets,
    (word dictionary, normalized dictionary)) — computed once per batch
    and reused by the heuristics, perplexity and stop-word kernels in the
    fused stage.

    The dictionary pair is the bandwidth lever: per-word kernels (regex
    match, length, stop-word lookup, hashing) run over the UNIQUE words
    only and gather by code — on web text the vocabulary is a small
    fraction of the token stream.  The materialized normalized TOKEN
    STREAM is deliberately NOT produced here (it would re-pay the
    per-token string gather this factoring avoids); a consumer that
    needs it takes ``pc.take(norm_dict, wdct.indices)``."""
    texts = as_single_array(texts)
    texts = pc.fill_null(pc.cast(texts, pa.large_string()), "")
    wvals, woff = split_words(texts)
    wdct = as_single_array(wvals).dictionary_encode()
    norm_dict = as_single_array(
        pc.utf8_trim(pc.utf8_lower(wdct.dictionary), WORD_TRIM_CHARS)
    )
    return texts, wvals, woff, (wdct, norm_dict)


def text_stats(
    texts: pa.ChunkedArray | pa.Array, pre=None
) -> dict[str, np.ndarray]:
    """Compute all heuristic signals for a column of documents.

    Nulls are treated as empty text (zeros everywhere) — conformance drops
    them independently.  ``pre`` is an optional ``tokenize(...)`` result.
    """
    texts, wvals, woff, (wdct, norm_dict) = (
        pre if pre is not None else tokenize(texts)
    )
    n = len(texts)
    code_ids = np.asarray(wdct.indices, dtype=np.int64)

    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

    n_words = np.diff(woff)
    nz = n_words > 0

    # per-word kernels run over the UNIQUE words (dictionary) and gather
    # by code: the regex/length/set-lookup cost scales with vocabulary,
    # not token count
    dict_lens = pc.utf8_length(wdct.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    word_lens = dict_lens[code_ids] if len(code_ids) else dict_lens[:0]
    total_word_chars = segment_sum_exact(word_lens, woff)
    mean_word_len = np.zeros(n, dtype=np.float64)
    mean_word_len[nz] = total_word_chars[nz] / n_words[nz]

    sym = pc.add(
        pc.count_substring(texts, "#"), pc.count_substring(texts, "…")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    symbol_ratio = np.zeros(n, dtype=np.float64)
    symbol_ratio[nz] = sym[nz] / n_words[nz]

    # fraction of words containing at least one letter (Gopher ~80% rule);
    # \p{L} (RE2) == str.isalpha's category-L check in the scalar spec
    dict_alpha = pc.match_substring_regex(wdct.dictionary, r"\p{L}").to_numpy(
        zero_copy_only=False).astype(np.int64)
    alpha_counts = segment_sum_exact(
        dict_alpha[code_ids] if len(code_ids) else dict_alpha[:0], woff
    )
    alpha_word_fraction = np.zeros(n, dtype=np.float64)
    alpha_word_fraction[nz] = alpha_counts[nz] / n_words[nz]

    dict_stop = pc.is_in(norm_dict, value_set=_STOPWORD_SET).to_numpy(
        zero_copy_only=False).astype(np.int64)
    stop_counts = segment_sum_exact(
        dict_stop[code_ids] if len(code_ids) else dict_stop[:0], woff
    )
    stop_fraction = np.zeros(n, dtype=np.float64)
    stop_fraction[nz] = stop_counts[nz] / n_words[nz]

    dup2 = _dup2gram_fraction(code_ids, woff)

    lines = pc.split_pattern(texts, "\n")
    lvals, loff = list_to_numpy_segments(lines)
    n_lines = np.diff(loff)
    bullet = pc.or_(pc.starts_with(lvals, "- "), pc.starts_with(lvals, "• "))
    ell = pc.or_(pc.ends_with(lvals, "..."), pc.ends_with(lvals, "…"))
    bullet_counts = segment_sum_exact(
        bullet.to_numpy(zero_copy_only=False).astype(np.int64), loff
    )
    ell_counts = segment_sum_exact(
        ell.to_numpy(zero_copy_only=False).astype(np.int64), loff
    )
    lz = n_lines > 0
    bullet_ratio = np.zeros(n, dtype=np.float64)
    ellipsis_ratio = np.zeros(n, dtype=np.float64)
    bullet_ratio[lz] = bullet_counts[lz] / n_lines[lz]
    ellipsis_ratio[lz] = ell_counts[lz] / n_lines[lz]

    return {
        "n_chars": n_chars,
        "n_words": n_words.astype(np.int64),
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_word_fraction": alpha_word_fraction,
        "stop_fraction": stop_fraction,
        "dup2gram_fraction": dup2,
        "bullet_ratio": bullet_ratio,
        "ellipsis_ratio": ellipsis_ratio,
    }
