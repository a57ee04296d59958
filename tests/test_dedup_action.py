"""Doc-level deduplicate() action: exact keeper selection, LSH
connected-component collapse, and the degenerate mass-duplicate case that
must NOT trigger a quadratic bucket join (VERDICT round-1 item 5/7)."""
from __future__ import annotations

import pytest

NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"
NEAR_C = "a quick brown fox jumps over the lazy dog near the river bank today"
OTHER = "completely different subject matter about spark distributed query engines"


@pytest.mark.spark
def test_deduplicate_exact_only(spark):
    from similardocs_spark.operators.dedup import deduplicate

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "bbb"), (6, "aaa")],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in deduplicate(docs, near=False).collect())
    assert got == [1, 2, 4]


@pytest.mark.spark
def test_deduplicate_near_collapses_lsh_components(spark):
    from similardocs_spark.operators.dedup import deduplicate, minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(10, NEAR_A), (11, NEAR_B), (12, NEAR_C), (20, OTHER), (21, NEAR_A)],
        "doc_id long, text string",
    )
    # sanity: the near-trio really does produce LSH candidate pairs
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert pairs, "fixture texts must collide in at least one LSH band"

    got = sorted(r["doc_id"] for r in deduplicate(docs).collect())

    # expected survivors: min doc_id of each connected component over the
    # exact-collapsed ids {10, 11, 12, 20} (21 is an exact dup of 10)
    parent = {d: d for d in (10, 11, 12, 20)}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(max(a, b))] = find(min(a, b))
    expected = sorted({find(d) for d in parent})
    assert got == expected
    assert 21 not in got and 10 in got and 20 in got


@pytest.mark.spark
def test_deduplicate_mass_duplicates_no_pair_explosion(spark):
    """10k identical docs: the exact-collapse prepass must reduce them to one
    representative BEFORE the LSH band join, so no O(n^2) pair stage runs."""
    from similardocs_spark.operators.dedup import deduplicate, minhash_lsh_pairs

    rows = [(i, "same boilerplate text repeated across the whole corpus badly")
            for i in range(10_000)]
    rows.append((10_000, OTHER))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    assert minhash_lsh_pairs(docs).count() == 0  # reps only: nothing to pair
    got = sorted(r["doc_id"] for r in deduplicate(docs).collect())
    assert got == [0, 10_000]


@pytest.mark.spark
def test_lsh_bucket_cap_and_audit(spark):
    """Distinct texts engineered into one bucket beyond the cap are skipped
    from the pair join but visible via lsh_oversized_buckets (no silent cap)."""
    from similardocs_spark.operators.dedup import (
        lsh_oversized_buckets,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [(i, NEAR_A + f" tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    uncapped = minhash_lsh_pairs(docs, max_bucket=2000).count()
    capped = minhash_lsh_pairs(docs, max_bucket=2).count()
    assert capped < uncapped
    audited = lsh_oversized_buckets(docs, max_bucket=2).collect()
    assert audited and all(r["bucket_size"] > 2 for r in audited)


@pytest.mark.spark
def test_simhash_bucket_cap_and_audit(spark):
    """Same no-silent-cap contract as MinHash: signatures engineered into one
    bucket beyond the cap are skipped from the pair join but visible via
    simhash_oversized_buckets."""
    from similardocs_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_oversized_buckets,
    )
    from similardocs_spark.util import local_df

    # 8 signatures identical in band 0 (low bits), spread in high bits
    sigs = [(i, (i << 28) | 0x0000ABC) for i in range(8)]
    sig_df = local_df(spark, sigs, "doc_id long, simhash long")
    uncapped = simhash_near_dup_pairs(
        None, max_hamming=3, signatures=sig_df, max_bucket=2000, bits=32
    ).count()
    capped = simhash_near_dup_pairs(
        None, max_hamming=3, signatures=sig_df, max_bucket=2, bits=32
    ).count()
    assert capped < uncapped

    # the audit helper runs the full text→signature lineage itself
    docs = spark.createDataFrame(
        [(i, NEAR_A + f" tail{i}") for i in range(8)],
        "doc_id long, text string",
    )
    over = simhash_oversized_buckets(docs, max_hamming=3, max_bucket=2).collect()
    assert over and all(r["bucket_size"] > 2 for r in over)


@pytest.mark.spark
def test_simhash_pairs_banded_equals_bruteforce(spark):
    """Pigeonhole exactness: the banded simhash pair join returns EXACTLY the
    brute-force ≤ max_hamming pair set (recall 1.0 by construction, every
    candidate verified)."""
    from pyspark.sql import functions as F

    from similardocs_spark.operators.dedup import simhash32, simhash_near_dup_pairs

    texts = [
        "zika dengue fever outbreak tropical",
        "zika dengue fever outbreak tropics",
        "completely different subject entirely here",
        "zika dengue fever outbreaks tropical",
        "malaria treatment protocol hospital",
        "malaria treatment protocols hospital",
    ] * 10
    docs = spark.createDataFrame(
        [(i, f"{t} tail{i % 7}") for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for mh in (1, 3):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_dup_pairs(docs, max_hamming=mh).collect()
        }
        sh = simhash32(docs)
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
        brute = {
            (r["doc_a"], r["doc_b"], r["h"])
            for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
            .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long"))
            .filter(F.col("h") <= mh)
            .collect()
        }
        assert got == brute and len(brute) > 0


def test_simhash_band_bounds_partition_all_bits():
    """Pin the band-split arithmetic for every practical max_hamming: the
    (max_hamming + 1) bands must partition bits 0..31 exactly — full
    coverage, no overlap, no empty band — which is the precondition for the
    pigeonhole exact-recall guarantee."""
    from similardocs_spark.operators.dedup import SIMHASH_BITS

    for mh in range(1, 16):
        nb = mh + 1
        bounds = [round(i * SIMHASH_BITS / nb) for i in range(nb + 1)]
        assert bounds[0] == 0 and bounds[-1] == SIMHASH_BITS
        widths = [bounds[i + 1] - bounds[i] for i in range(nb)]
        assert all(w >= 1 for w in widths), (mh, widths)
        assert sum(widths) == SIMHASH_BITS


@pytest.mark.spark
def test_simhash_pairs_banded_equals_bruteforce_sweep(spark):
    """Banded ≡ brute-force for max_hamming 1..8 over adversarial random
    signatures (planted near pairs at every distance), exercising every band
    split's masking/shifting — signatures precomputed once and fed via the
    `signatures` parameter so the sweep is pure band math, no tokenizing."""
    import random

    from similardocs_spark.operators.dedup import simhash_near_dup_pairs
    from similardocs_spark.util import local_df

    rng = random.Random(42)
    sigs: list[tuple[int, int]] = []
    doc_id = 0
    for _ in range(40):
        base = rng.getrandbits(32)
        sigs.append((doc_id, base))
        doc_id += 1
        # plant a neighbor at every distance 0..9 from some base
        d = rng.randrange(10)
        flipped = base
        for bit in rng.sample(range(32), d):
            flipped ^= 1 << bit
        sigs.append((doc_id, flipped))
        doc_id += 1
    sig_df = local_df(spark, sigs, "doc_id long, simhash long")

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    for mh in range(1, 9):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_dup_pairs(
                None, max_hamming=mh, signatures=sig_df, bits=32
            ).collect()
        }
        brute = {
            (a, b, hamming(sa, sb))
            for a, sa in sigs
            for b, sb in sigs
            if a < b and hamming(sa, sb) <= mh
        }
        assert got == brute, f"max_hamming={mh}"
        assert brute, f"fixture must contain pairs at max_hamming={mh}"


@pytest.mark.spark
def test_simhash64_banded_equals_bruteforce(spark):
    """64-bit variant: banded ≡ brute force over random 64-bit signatures
    with planted near pairs — exercises the sign bit (values ≥ 2^63 stored
    as negative longs) and the 16-bit band masks — plus a text-lineage run
    of simhash64 end to end."""
    import random

    from pyspark.sql import functions as F

    from similardocs_spark.operators.dedup import (
        simhash64,
        simhash_near_dup_pairs,
    )
    from similardocs_spark.util import local_df

    rng = random.Random(7)
    sigs: list[tuple[int, int]] = []
    doc_id = 0
    for _ in range(30):
        base = rng.getrandbits(64)
        for v in (base, *(base ^ sum(1 << b for b in rng.sample(range(64), d))
                          for d in (1, 3, 5))):
            signed = v - (1 << 64) if v >= (1 << 63) else v
            sigs.append((doc_id, signed))
            doc_id += 1
    sig_df = local_df(spark, sigs, "doc_id long, simhash long")

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for mh in (1, 3):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_near_dup_pairs(
                None, max_hamming=mh, signatures=sig_df, bits=64
            ).collect()
        }
        brute = {
            (a, b, hamming(sa, sb))
            for a, sa in sigs
            for b, sb in sigs
            if a < b and hamming(sa, sb) <= mh
        }
        assert got == brute and brute, f"bits=64 max_hamming={mh}"

    # text lineage: simhash64 values feed the same banded join; verify the
    # band join against a brute-force DataFrame xor on the same signatures
    texts = [
        "zika dengue fever outbreak tropical",
        "zika dengue fever outbreak tropics",
        "malaria treatment protocol hospital",
    ] * 5
    docs = spark.createDataFrame(
        [(i, f"{t} tail{i % 4}") for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_near_dup_pairs(docs, max_hamming=6, bits=64).collect()
    }
    sh = simhash64(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["h"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long"))
        .filter(F.col("h") <= 6)
        .collect()
    }
    assert got == brute and brute


@pytest.mark.spark
def test_simhash_bits_auto_selection(spark, monkeypatch):
    """Defaulted bits=None auto-selects 64-bit signatures at corpus scale
    (round-4: 32-bit band keys saturate ≥~10^5 docs) and 32-bit below it;
    precomputed signatures demand an explicit bits."""
    from similardocs_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"zika dengue fever outbreak tropical tail{i % 3} x{i}") for i in range(12)],
        "doc_id long, text string",
    )
    # small corpus → 32-bit (identical pair set to explicit bits=32)
    auto = {tuple(r) for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    pinned = {
        tuple(r) for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3, bits=32).collect()
    }
    assert auto == pinned

    # corpus above the threshold → 64-bit
    monkeypatch.setattr(dedup, "SIMHASH_AUTO64_MIN_DOCS", 10)
    auto64 = {
        tuple(r) for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    pinned64 = {
        tuple(r) for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3, bits=64).collect()
    }
    assert auto64 == pinned64

    sig = dedup.simhash32(docs)
    with pytest.raises(ValueError, match="explicit bits"):
        dedup.simhash_near_dup_pairs(None, max_hamming=3, signatures=sig)


@pytest.mark.spark
def test_minhash_band_config_dial(spark):
    """(n_hashes, n_bands) are arguments end-to-end: more bands at fewer
    rows-per-band can only widen the candidate set on the same corpus
    (probability of some band matching is monotone in band count at fixed
    rows); invalid splits fail fast."""
    from similardocs_spark.operators.dedup import minhash_lsh_pairs

    texts = [
        "zika dengue fever outbreak tropical region report",
        "zika dengue fever outbreak tropical region reports",
        "different completely unrelated subject matter here now",
    ]
    docs = spark.createDataFrame(
        [(i, texts[i % 3] + f" tail{i}") for i in range(12)],
        "doc_id long, text string",
    )
    strict = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, n_hashes=12, n_bands=2).collect()
    }
    loose = {
        tuple(r)
        for r in minhash_lsh_pairs(docs, n_hashes=12, n_bands=4).collect()
    }
    assert strict <= loose

    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs, n_hashes=12, n_bands=5).count()


@pytest.mark.spark
def test_minhash_jaccard_estimate_exact_parity(spark):
    """jaccard_est equals the signature-agreement fraction recomputed in
    Python from the operator's own shingle sets (same md5 seed family),
    and min_jaccard filters exactly on that value."""
    import hashlib

    from similardocs_spark.operators.dedup import minhash_lsh_pairs, shingles

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " kilo"),
            (3, "totally different words here now aardvark basilisk caiman"),
            (4, "totally different words here now aardvark basilisk caimans"),
        ],
        "doc_id long, text string",
    )
    n_hashes, n_bands = 8, 4
    rows = minhash_lsh_pairs(
        docs, estimate_jaccard=True, n_hashes=n_hashes, n_bands=n_bands
    ).collect()
    assert rows, "fixture pairs must survive banding"

    sets: dict[int, set[str]] = {}
    for r in shingles(docs).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])

    def mh(doc: int, i: int) -> str:
        return min(
            hashlib.md5(f"{i}|{s}".encode()).hexdigest() for s in sets[doc]
        )

    by_pair = {}
    for r in rows:
        agree = sum(
            mh(r["doc_a"], i) == mh(r["doc_b"], i) for i in range(n_hashes)
        )
        assert r["jaccard_est"] == agree / n_hashes
        by_pair[(r["doc_a"], r["doc_b"])] = r["jaccard_est"]

    for t in (0.5, 0.9):
        kept = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(
                docs, n_hashes=n_hashes, n_bands=n_bands, min_jaccard=t
            ).collect()
        }
        assert kept == {k for k, v in by_pair.items() if v >= t}


@pytest.mark.spark
def test_deduplicate_min_jaccard_gate(spark):
    """min_jaccard above every edge estimate disables near-dedup (only the
    exact collapse remains); without it the near-dup pair is dropped."""
    from similardocs_spark.operators.dedup import deduplicate

    long_base = (
        "zika dengue fever outbreak tropical region report alpha bravo "
        "charlie delta echo foxtrot golf hotel india"
    )
    docs = spark.createDataFrame(
        [
            (1, long_base + " juliet"),
            (2, long_base + " juliets"),
            (3, "completely unrelated subject matter discussed here often"),
        ],
        "doc_id long, text string",
    )
    plain = {r["doc_id"] for r in deduplicate(docs).collect()}
    assert plain == {1, 3}
    gated = {r["doc_id"] for r in deduplicate(docs, min_jaccard=1.01).collect()}
    assert gated == {1, 2, 3}
