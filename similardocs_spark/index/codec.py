"""Posting-list codec: delta + byte-aligned frame-of-reference blocks (numpy).

From-scratch replacement for Lucene's FOR/patched-delta postings codec
(north_rule: "docID-sorted arrays with delta + varint/FOR compression").
Design choice: byte-aligned FOR over bit-packing — gap widths snap to
{1,2,4,8} bytes per 128-gap block, which keeps encode AND decode fully
vectorized in numpy (no per-value Python), costs ≤ ~1 bit/doc vs bit-packed
FOR on typical gap distributions, and decodes faster than varint (no
continuation-bit scan).

Blob layout (little-endian):
    uint32  n                  number of docIDs
    per block (128 gaps):
        uint8   width          gap width in bytes (1|2|4|8)
        width*k bytes          k gaps (k ≤ 128), first gap relative to the
                               previous block's last docID (or to -1)

Block-max metadata (per-term, kept as plain array columns next to the blob):
    block_last : int64[]       last docID of each block (skip pointers)
    block_min_dlq : int64[]    min quantized doc length in each block —
                               tfnorm is monotone-decreasing in dlq, so a
                               term's best possible score in a block is
                               weight·idf·tfnorm(min_dlq, avgdl). Storing the
                               LENGTH (not the tfnorm) keeps the metadata
                               valid when avgdl drifts under incremental
                               updates (Lucene likewise derives avgdl from
                               live index stats at query time).
"""
from __future__ import annotations

import numpy as np

BLOCK = 128
_WIDTHS = (1, 2, 4, 8)
_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def encode_docids(doc_ids: np.ndarray) -> bytes:
    """Encode a strictly-increasing int64 docID array."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    n = len(ids)
    out = bytearray(np.uint32(n).tobytes())
    if n == 0:
        return bytes(out)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0] + 1)  # relative to -1
    np.subtract(ids[1:], ids[:-1], out=gaps[1:], casting="unsafe")
    for s in range(0, n, BLOCK):
        blk = gaps[s : s + BLOCK]
        mx = int(blk.max())
        width = next(w for w in _WIDTHS if mx < (1 << (8 * w)))
        out.append(width)
        out += blk.astype(_DTYPES[width]).tobytes()
    return bytes(out)


def decode_docids(blob: bytes) -> np.ndarray:
    """Decode back to the int64 docID array."""
    n = int(np.frombuffer(blob, dtype=np.uint32, count=1)[0])
    gaps = np.empty(n, dtype=np.uint64)
    pos = 4
    filled = 0
    while filled < n:
        k = min(BLOCK, n - filled)
        width = blob[pos]
        pos += 1
        gaps[filled : filled + k] = np.frombuffer(blob, dtype=_DTYPES[width], count=k, offset=pos)
        pos += width * k
        filled += k
    ids = np.cumsum(gaps.astype(np.int64))
    ids -= 1
    return ids


def block_metadata(doc_ids: np.ndarray, dlqs: np.ndarray) -> tuple[list[int], list[int]]:
    """Per-128-block (last docID, min quantized dl) for skip + block-max WAND."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    dq = np.asarray(dlqs, dtype=np.int64)
    last: list[int] = []
    mn: list[int] = []
    for s in range(0, len(ids), BLOCK):
        last.append(int(ids[s : s + BLOCK][-1]))
        mn.append(int(dq[s : s + BLOCK].min()))
    return last, mn
