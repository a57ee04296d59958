"""Regenerate the checked-in golden top-k files (tests/golden/topk_*.json).

Run explicitly — never at test time (FIXTURES.md §6). The goldens pin the
pure-Python oracle's output for the reference query set over the standard
fixture corpus (100 convs, seed 42), in several modes.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from similardocs_spark.fixtures import (  # noqa: E402
    END_DAYS_AGO,
    PINNED_TODAY,
    REFERENCE_QUERIES,
    make_transcripts,
    oracle_docs,
)
from similardocs_spark.oracle.refsearch import OracleIndex, OracleSearch  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

MODES = {
    "plain": {},
    "split": {"split_time": True},
    "sources": {"sources": {"MEDLINE", "LILACS"}},
    "lastdays": {"last_days": 400},
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    idx = OracleIndex.build(oracle_docs(make_transcripts(100, seed=42)))
    search = OracleSearch(idx, PINNED_TODAY, END_DAYS_AGO)
    for qname, text in REFERENCE_QUERIES.items():
        out = {}
        for mode_name, mode in MODES.items():
            hits = search.search(text, **mode)
            out[mode_name] = [
                {
                    "rank": i + 1,
                    "doc_id": h.doc_id,
                    "conv_id": h.conv_id,
                    "score": float(h.score),
                    "n_common": h.n_common,
                    "update_date": h.update_date,
                }
                for i, h in enumerate(hits)
            ]
        path = os.path.join(OUT, f"topk_{qname}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
