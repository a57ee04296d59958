"""BM25 scoring spec — Lucene-faithful math, pinned deterministic accumulation.

The reference never configures a Similarity, so scoring is Lucene 10's default
BM25Similarity(k1=1.2, b=0.75) over the single catenated field (verified: no
setSimilarity call anywhere in the reference; BM25 executed at
SimDocsSearch.scala:301). Because the reference analyzer dedups tokens per
field (NGramFilter.scala:30,106-109) and each document has exactly one
`_indexed_` field instance (LuceneIndexAkka.scala:295), **tf == 1 for every
(term, doc)** and doc length == the number of DISTINCT prefix tokens. That
collapses BM25 to:

    score(q, d) = consts(q) + Σ_t  w_t · idf(t) · tfnorm(d)
    idf(t)      = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))          (float32)
    tfnorm(d)   = 1 / (1 + k1·(1 − b + b·dl⁴(d)/avgdl))            (float32)

where dl⁴ is the doc length after Lucene's lossy 1-byte norm round-trip
(SmallFloat intToByte4/byte4ToInt — reimplemented below from the published
algorithm: 4 mantissa bits, values < 24 exact), avgdl = Σ exact dl / N, and
w_t = query-term multiplicity (duplicate SHOULD clauses merge boosts).

consts(q): MUST clauses all contribute score in Lucene. The always-present
update_date TermRangeQuery rewrites to a constant-score query (+1.0); a
`db`/`instance` filter adds the BM25 score of the matching keyword term on a
norms-omitted DOCS-only field: idf_fld(value) · 1/(1 + k1·(1−b+b·1/avgdl_fld)).

Pinned deviation (SURVEY.md §4.4.4): Lucene accumulates float32 per-term scores
in disjunction traversal order; we pin: per-term score computed in float32,
summed in float64, final cast to float32. Order-independent and vectorizable;
rank differences vs real Lucene are possible only at sub-ulp knife edges.
The pure-Python oracle and the Spark engine implement THIS spec identically.
"""
from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75

# ---------------------------------------------------------------- SmallFloat

# longToInt4(Integer.MAX_VALUE) = 231  →  NUM_FREE_VALUES = 255 - 231 = 24
_NUM_FREE_VALUES = 24


def _long_to_int4(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Lossy 4-mantissa-bit encoding of a non-negative int into [0, 255]."""
    if i < 0:
        raise ValueError("negative")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


# LENGTH_TABLE equivalent: decoded value for each of the 256 norm bytes.
LENGTH_TABLE: tuple[int, ...] = tuple(byte4_to_int(b) for b in range(256))


def quantize_dl(dl: int) -> int:
    """Round-trip a doc length through the 1-byte norm (down-rounds to the
    nearest representable value; exact for dl < 24)."""
    return byte4_to_int(int_to_byte4(dl))


def quantize_dl_np(dl: np.ndarray) -> np.ndarray:
    """Vectorized quantize_dl for int arrays (numpy)."""
    v = np.asarray(dl, dtype=np.int64) - _NUM_FREE_VALUES
    small = v < 0
    # bit_length via log2 on positive ints is unsafe at boundaries; use frexp
    vv = np.where(small, 1, v)
    nbits = np.frexp(vv.astype(np.float64))[1]  # exact for ints < 2^53
    shift = np.maximum(nbits - 4, 0)
    quant = (vv >> shift) << shift
    return np.where(small, np.asarray(dl), _NUM_FREE_VALUES + quant).astype(np.int64)


# ---------------------------------------------------------------- BM25 pieces


def idf(df: int, n_docs: int) -> np.float32:
    """float32(ln(1 + (N - df + 0.5)/(df + 0.5)))."""
    return np.float32(math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def idf_np(df: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log1p((n_docs - df + 0.5) / (df + 0.5)).astype(np.float32)


def tfnorm(dl_quant: int, avgdl: float) -> np.float32:
    """Per-doc tf-normalization factor with tf == 1."""
    return np.float32(1.0 / (1.0 + K1 * (1.0 - B + B * dl_quant / avgdl)))


def tfnorm_np(dl_quant: np.ndarray, avgdl: float) -> np.ndarray:
    return (1.0 / (1.0 + K1 * (1.0 - B + B * dl_quant.astype(np.float64) / avgdl))).astype(
        np.float32
    )


def keyword_clause_score(df: int, n_docs: int, avgdl_fld: float = 1.0) -> np.float32:
    """Score contribution of a MUST TermQuery on a keyword (StringField) field:
    norms omitted → norm byte 1 → dl 1; DOCS-only → freq 1."""
    t = np.float32(1.0 / (1.0 + K1 * (1.0 - B + B * 1.0 / avgdl_fld)))
    return np.float32(np.float32(idf(df, n_docs)) * t)

DATE_RANGE_CONST = np.float32(1.0)  # TermRangeQuery rewrites to constant score


def doc_score(
    matched_weighted_idfs: list[np.float32] | np.ndarray,
    tfnorm_d: np.float32,
    const: float = 0.0,
) -> np.float32:
    """Spec accumulation: float64 sum of float32 per-term scores + consts,
    cast to float32."""
    per_term = np.asarray(matched_weighted_idfs, dtype=np.float32) * np.float32(tfnorm_d)
    return np.float32(np.float64(const) + per_term.astype(np.float32).astype(np.float64).sum())
