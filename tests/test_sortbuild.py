"""Sort-based posting encoder: carry across Arrow batch boundaries, codec
round-trip, equality with a naive reference grouping."""
from __future__ import annotations

import numpy as np
import pandas as pd

from similardocs_spark.index import codec
from similardocs_spark.index.sortbuild import _encode_groups


def _reference(rows):
    groups = {}
    for seg, term, doc_id, dlq in rows:
        groups.setdefault((seg, term), []).append((doc_id, dlq))
    out = {}
    for (seg, term), lst in groups.items():
        ids = np.array([d for d, _ in lst], dtype=np.int64)
        dlqs = np.array([q for _, q in lst], dtype=np.int64)
        out[(seg, term)] = (ids, dlqs)
    return out


def _run(rows, batch_sizes):
    batches = []
    i = 0
    for b in batch_sizes:
        chunk = rows[i : i + b]
        i += b
        batches.append(
            pd.DataFrame(chunk, columns=["seg", "term", "doc_id", "dlq"])
        )
    assert i == len(rows)
    out = pd.concat(list(_encode_groups(iter(batches))), ignore_index=True)
    return out


def test_encoder_carry_and_content():
    rng = np.random.default_rng(5)
    rows = []
    for seg in (0, 1):
        for t in range(20):
            term = f"t{t:03d}"
            ids = np.sort(rng.choice(5000, size=rng.integers(1, 400), replace=False))
            for d in ids:
                rows.append((seg, term, int(d) + seg * 5000, int(rng.integers(3, 90))))
    ref = _reference(rows)

    for sizes in ([len(rows)], [7] * (len(rows) // 7) + [len(rows) % 7], [1] * len(rows)):
        sizes = [s for s in sizes if s > 0]
        out = _run(rows, sizes)
        assert len(out) == len(ref)
        for r in out.itertuples(index=False):
            ids, dlqs = ref[(r.seg, r.term)]
            assert r.df_seg == len(ids)
            got_ids = codec.decode_docids(bytes(r.blob))
            assert np.array_equal(got_ids, ids), (r.seg, r.term)
            bl, bm = codec.block_metadata(ids, dlqs)
            assert list(r.block_last) == bl
            assert list(r.block_min_dlq) == bm


def test_encoder_empty_batches():
    out = list(_encode_groups(iter([pd.DataFrame(columns=["seg", "term", "doc_id", "dlq"])])))
    assert not out or sum(len(o) for o in out) == 0
