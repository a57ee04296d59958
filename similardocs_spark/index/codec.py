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
    block_max_tfnorm : float32[]  max per-doc tfnorm in each block —
                               with tf ≡ 1 (see bm25.py) a term's best
                               possible score in a block is
                               weight·idf·block_max_tfnorm (block-max WAND).
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


def block_metadata(doc_ids: np.ndarray, tfnorms: np.ndarray) -> tuple[list[int], list[float]]:
    """Per-128-block (last docID, max tfnorm) for skip + block-max WAND."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfnorms, dtype=np.float32)
    last: list[int] = []
    mx: list[float] = []
    for s in range(0, len(ids), BLOCK):
        last.append(int(ids[s : s + BLOCK][-1]))
        mx.append(float(tf[s : s + BLOCK].max()))
    return last, mx
