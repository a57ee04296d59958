"""Duplicate-span detection: Spark vs pure-Python recompute."""
from __future__ import annotations

import pytest

from similardocs_spark.operators.spandedup import (
    duplicate_spans,
    strip_duplicate_spans,
)

pytestmark = pytest.mark.usefixtures("spark")

N = 5


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().replace("\n", " ").split(" ") if t]


def _py_spans(docs: list[tuple[int, str]], n: int) -> dict[int, dict]:
    from collections import Counter

    wins = {}  # doc_id -> [window strings in position order]
    for did, text in docs:
        w = _toks(text)
        wins[did] = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
    freq = Counter(g for ws in wins.values() for g in ws)
    out = {}
    for did, text in docs:
        w = _toks(text)
        dup_pos = [i for i, g in enumerate(wins[did]) if freq[g] >= 2]
        covered, prev = 0, -n
        for p in dup_pos:
            covered += min(n, p - prev)
            prev = p
        nt = len(w)
        out[did] = {
            "n_tokens": nt,
            "n_windows": max(0, nt - n + 1),
            "n_dup_windows": len(dup_pos),
            "dup_tokens": covered,
            "dup_token_frac_e6": round(covered * 1e6 / max(nt, 1)),
        }
    return out


SHARED = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens

DOCS = [
    # 0 and 1 share a 10-token span (6 dup windows each at n=5); distinct
    # surroundings
    (0, f"alpha beta {SHARED} gamma delta epsilon"),
    (1, f"one two three {SHARED} four five"),
    # 2: clean, long enough to have windows
    (2, "rain falls softly on the green hills beyond the river bend today"),
    # 3: WITHIN-doc repeat of one span (duplication even with no partner)
    (
        3,
        "header line mark alpha omega zed mark alpha omega zed trailer pad",
    ),
    # 4: shorter than n tokens -> zero windows, all-zero row
    (4, "tiny doc here"),
    # 5: empty text
    (5, ""),
    # 6: case/newline normalization must still match doc 0's span
    (6, f"prefix {SHARED.upper().replace(' ', chr(10))} suffix pad pad"),
    # 7: two DISJOINT dup spans (coverage = sum, no interval overlap):
    #    shares "mark alpha omega zed" 4-gram? no — n=5; share a 5-token
    #    run with doc 2's opening and doc 2's ending, far apart
    (
        7,
        "rain falls softly on the xx yy zz ww vv hills beyond the river bend",
    ),
]


def test_matches_python_recompute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: {k: r[k] for k in (
            "n_tokens", "n_windows", "n_dup_windows", "dup_tokens",
            "dup_token_frac_e6",
        )}
        for r in duplicate_spans(docs, n=N).collect()
    }
    assert got == _py_spans(DOCS, N)


def test_overlapping_windows_merge_coverage(spark):
    # docs 0/1: a shared 10-token span at n=5 -> 6 dup windows whose
    # [pos, pos+5) intervals overlap; coverage must be 10 tokens, not 30
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, n=N).collect()}
    assert rows[0]["n_dup_windows"] == 6
    assert rows[0]["dup_tokens"] == 10
    assert rows[1]["n_dup_windows"] == 6
    assert rows[1]["dup_tokens"] == 10


def test_within_doc_repeat_flagged(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, n=4).collect()}
    # doc 3 repeats "mark alpha omega zed" twice within itself
    assert rows[3]["n_dup_windows"] >= 2


def test_short_and_empty_docs_zero(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in duplicate_spans(docs, n=N).collect()}
    for did in (4, 5):
        assert rows[did]["n_windows"] == 0
        assert rows[did]["n_dup_windows"] == 0
        assert rows[did]["dup_tokens"] == 0
        assert rows[did]["dup_token_frac_e6"] == 0
    assert len(rows) == len(DOCS)  # every input doc present


def test_broadcast_and_shuffle_strategies_agree(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, duplicate_spans(docs, n=N, broadcast=True).collect()))
    b = sorted(map(tuple, duplicate_spans(docs, n=N, broadcast=False).collect()))
    assert a == b


def _py_strip(docs: list[tuple[int, str]], n: int) -> dict[int, tuple]:
    from collections import defaultdict

    occ = defaultdict(list)  # window string -> [(doc_id, pos)]
    toks = {}
    for did, text in docs:
        w = _toks(text)
        toks[did] = [t for t in text.replace("\n", " ").split(" ") if t]
        for i in range(len(w) - n + 1):
            occ[" ".join(w[i : i + n])].append((did, i))
    drops = defaultdict(set)
    for positions in occ.values():
        if len(positions) < 2:
            continue
        keep = min(positions)
        for did, p in positions:
            if (did, p) != keep:
                drops[did].update(range(p, p + n))
    out = {}
    for did, text in docs:
        if did not in drops:
            out[did] = (text, 0)
        else:
            kept = [t for i, t in enumerate(toks[did]) if i not in drops[did]]
            out[did] = (" ".join(kept), len(toks[did]) - len(kept))
    return out


def test_strip_matches_python_recompute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_dropped_tokens"])
        for r in strip_duplicate_spans(docs, n=N).collect()
    }
    assert got == _py_strip(DOCS, N)


def test_strip_keeps_exactly_one_copy(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: r for r in strip_duplicate_spans(docs, n=N).collect()
    }
    # canonical occurrence = minimal (doc_id, pos): doc 0 keeps the shared
    # span verbatim, docs 1 and 6 lose it (10 tokens each)
    assert rows[0]["n_dropped_tokens"] == 0
    assert SHARED in rows[0]["text"]
    assert rows[1]["n_dropped_tokens"] == 10
    assert SHARED not in rows[1]["text"].lower()
    assert rows[6]["n_dropped_tokens"] == 10
    # untouched docs keep ORIGINAL text byte-identical (no ws rewriting)
    assert rows[2]["text"] == DOCS[2][1]
    assert rows[5]["text"] == ""
    # doc 1's surroundings survive
    assert rows[1]["text"].startswith("one two three")
    assert rows[1]["text"].endswith("four five")


def test_strip_within_doc_repeat_keeps_first(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in strip_duplicate_spans(docs, n=4).collect()
    }
    # doc 3 repeats "mark alpha omega zed" at pos 2 and 6: the first stays
    t = rows[3]["text"]
    assert t.count("mark alpha omega zed") == 1
    assert rows[3]["n_dropped_tokens"] == 4


def test_randomized_corpus_matches_python(spark):
    """150 seeded random docs over a 3-token alphabet (duplicate windows
    abound, incl. within-doc repeats) — one job each for detect + strip
    vs the python recomputes."""
    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("ab cd EF".split()) for _ in range(rng.randint(0, 30))))
        for i in range(150)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: {k: r[k] for k in (
            "n_tokens", "n_windows", "n_dup_windows", "dup_tokens",
            "dup_token_frac_e6",
        )}
        for r in duplicate_spans(sdf, n=3).collect()
    }
    assert got == _py_spans(docs, 3)
    got_strip = {
        r["doc_id"]: (r["text"], r["n_dropped_tokens"])
        for r in strip_duplicate_spans(sdf, n=3).collect()
    }
    assert got_strip == _py_strip(docs, 3)


def test_strip_strategies_agree(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, strip_duplicate_spans(docs, n=N, broadcast=True).collect()))
    b = sorted(map(tuple, strip_duplicate_spans(docs, n=N, broadcast=False).collect()))
    assert a == b
