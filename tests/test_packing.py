"""Sequence packing: distributed two-level prefix sum vs python recompute."""
from __future__ import annotations

import pytest

from similardocs_spark.operators.packing import pack_sequences

pytestmark = pytest.mark.usefixtures("spark")

# (doc_id, tokens): includes zero-token docs, a doc far larger than
# seq_len (straddles many sequences), and ids arriving unsorted
ROWS = [
    (7, 100), (1, 50), (3, 0), (2, 2000), (9, 4096), (4, 1), (8, 0),
    (5, 2047), (6, 3), (0, 10),
]
SEQ = 128


def _expected(seq_len=SEQ):
    out = {}
    cum = 0
    for did, t in sorted(ROWS):
        start = cum
        cum += t
        first = start // seq_len
        last = (cum - 1) // seq_len if t > 0 else first
        out[did] = (start, first, last, last - first + 1)
    return out


def test_pack_sequences_matches_python_any_partitioning(spark):
    exp = _expected()
    for n_part in (1, 3, 7):
        df = spark.createDataFrame(ROWS, ["doc_id", "tokens"]).repartition(4)
        got = {
            r["doc_id"]: (
                r["start_tok"], r["seq_first"], r["seq_last"], r["n_seqs"]
            )
            for r in pack_sequences(df, seq_len=SEQ, num_partitions=n_part).collect()
        }
        assert got == exp, n_part


def test_pack_sequences_stream_is_contiguous(spark):
    """Consecutive docs join exactly: start[i+1] == start[i] + tokens[i]."""
    df = spark.createDataFrame(ROWS, ["doc_id", "tokens"])
    got = {r["doc_id"]: r["start_tok"]
           for r in pack_sequences(df, seq_len=SEQ, num_partitions=3).collect()}
    cum = 0
    for did, t in sorted(ROWS):
        assert got[did] == cum
        cum += t


def test_pack_sequences_rejects_bad_seq_len(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "tokens"])
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
