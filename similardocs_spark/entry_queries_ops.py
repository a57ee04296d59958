"""Driver-contract pairs for the training-data operators (dedup, ANN,
text analysis, multimodal plumbing). Same contract as entry_queries.py:
cross-engine-stable hashing (md5), floats encoded as rounded BIGINTs.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import ann, dedup, multimodal, textstats
from .oracle import sqlgen
from .util import read_spread

# ------------------------------------------------------------ 11. exact dedup


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.exact_dedup_stats(docs)


SQL_EXACT_DEDUP = """
WITH g AS (
  SELECT md5(text) AS text_hash, COUNT(*) AS group_size, MIN(doc_id) AS keeper
  FROM documents GROUP BY md5(text)
)
SELECT COUNT(*) AS n_groups, CAST(SUM(group_size) AS BIGINT) AS n_docs,
       CAST(SUM(group_size) - COUNT(*) AS BIGINT) AS n_dups, MAX(group_size) AS max_group
FROM g
"""


# ------------------------------------------------------- 12. minhash LSH pairs


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return dedup.minhash_lsh_pairs(docs, estimate_jaccard=True).orderBy(
        "doc_a", "doc_b"
    )


def _sql_shingle_ctes(src: str = "documents") -> str:
    """raw/pos/ranked/sh CTE bodies producing DISTINCT ordered 3-token
    shingles per doc (mirrors operators.dedup.shingles)."""
    return f"""
raw AS (
  SELECT doc_id, u.i AS i, w.l[u.i] AS t
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS l FROM {src}) w,
       UNNEST(generate_series(1, len(w.l))) u(i)
),
pos AS (
  SELECT doc_id, substr(t, 1, 6) AS term, MIN(i) AS fpos
  FROM raw WHERE len(t) >= 3 AND t NOT IN (SELECT w FROM stop)
  GROUP BY doc_id, substr(t, 1, 6)
),
ranked AS (SELECT doc_id, term,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fpos) AS rnk
           FROM pos),
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM ranked a
  JOIN ranked b ON a.doc_id = b.doc_id AND b.rnk = a.rnk + 1
  JOIN ranked c ON a.doc_id = c.doc_id AND c.rnk = a.rnk + 2
)"""


def _sql_minhash() -> str:
    n, bands = dedup.N_HASHES, dedup.N_BANDS
    rows = n // bands
    mh_cols = ", ".join(
        f"MIN(md5('{i}|' || shingle)) AS mh{i}" for i in range(n)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '_' || ".join(f"mh{b * rows + j}" for j in range(rows)),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(n)
    )
    # mirrors minhash_lsh_pairs(estimate_jaccard=True): exact-collapse
    # prepass (reps) + bucket cap + signature-agreement Jaccard estimate
    return f"""
WITH {sqlgen.stopword_cte()},
reps AS (SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
         FROM documents GROUP BY md5(text)),
{_sql_shingle_ctes(src="reps")},
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
ok AS (SELECT b.* FROM bands b JOIN bsz s ON b.band = s.band AND b.key = s.key
       WHERE s.n <= {dedup.MAX_BUCKET}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM ok a JOIN ok b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b,
       CAST({agree} AS DOUBLE) / {n} AS jaccard_est
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b
ORDER BY doc_a, doc_b
"""


SQL_MINHASH_PAIRS = _sql_minhash()


# -------------------------------------------- 12b. incremental minhash ingest


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest: even doc_ids are the accepted corpus (signature
    state only — its texts are never re-shingled), odd doc_ids arrive as a
    new batch; candidate pairs with ≥1 new side. operators/
    dedup_incremental.py:pairs_against."""
    from .operators import dedup_incremental as inc

    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return inc.pairs_against(batch, inc.signatures_for(corpus)).orderBy(
        "doc_a", "doc_b"
    )


def _sql_minhash_incremental() -> str:
    n, bands = dedup.N_HASHES, dedup.N_BANDS
    rows = n // bands
    mh_cols = ", ".join(
        f"MIN(md5('{i}|' || shingle)) AS mh{i}" for i in range(n)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || '_' || ".join(f"mh{b * rows + j}" for j in range(rows)),
        )
        for b in range(bands)
    )
    # per-SIDE exact collapse (GROUP BY md5, parity) — a batch text equal to
    # a corpus text still pairs; corpus×corpus candidates are excluded by
    # the ≥1-odd-side predicate
    return f"""
WITH {sqlgen.stopword_cte()},
reps AS (SELECT MIN(doc_id) AS doc_id, MIN(text) AS text
         FROM documents GROUP BY md5(text), doc_id % 2),
{_sql_shingle_ctes(src="reps")},
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
ok AS (SELECT b.* FROM bands b JOIN bsz s ON b.band = s.band AND b.key = s.key
       WHERE s.n <= {dedup.MAX_BUCKET})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM ok a JOIN ok b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE a.doc_id % 2 = 1 OR b.doc_id % 2 = 1
ORDER BY doc_a, doc_b
"""


SQL_MINHASH_INCREMENTAL = _sql_minhash_incremental()


# --------------------------------------------------------------- 13. simhash32


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return dedup.simhash32(docs).orderBy("doc_id")


def _sql_simhash(table: str = "documents", pairs_max_hamming: int | None = None) -> str:
    # hex[1:8] of md5 → 32-bit int, digit by digit (engine-portable)
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hexval = " + ".join(
        f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8)
    )
    votes = ", ".join(
        f"SUM(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(32)
    )
    bits = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    base = f"""
WITH {sqlgen.stopword_cte()}, {sqlgen.tokens_cte(table=table)},
hashed AS (SELECT doc_id, md5(term) AS h FROM toks),
hv AS (SELECT doc_id, {hexval} AS hv FROM hashed),
agg AS (SELECT doc_id, {votes} FROM hv GROUP BY doc_id)"""
    if pairs_max_hamming is None:
        return base + f"""
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg ORDER BY doc_id
"""
    # exact all-pairs oracle: the Spark operator's band-bucketed join has
    # EXACT recall at ≤ max_hamming (pigeonhole over max_hamming+1 bands),
    # so banded result ≡ brute force
    return base + f""",
sh AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {pairs_max_hamming}
ORDER BY doc_a, doc_b
"""


SQL_SIMHASH = _sql_simhash()


# ------------------------------------------------- 13b. simhash hamming pairs


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (pigeonhole-exact) SimHash near-dup pairs on a bounded doc
    slice — the word-soup bench corpus collides simhashes heavily, so the
    500-doc slice keeps the oracle's O(n²) check and the result set bounded
    (same slicing convention as embed_near_dups)."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    return dedup.simhash_near_dup_pairs(docs, max_hamming=3, bits=32).orderBy(
        "doc_a", "doc_b"
    )


SQL_SIMHASH_PAIRS = _sql_simhash(
    table="(SELECT * FROM documents WHERE doc_id < 500)", pairs_max_hamming=3
)


# ------------------------------------------- 13d. 64-bit simhash pairs


def q_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit banded Hamming-pair join (the ≥10^5-doc variant — 16-bit band
    keys; see operators/dedup.simhash64). Same pigeonhole-exact recall
    contract as the 32-bit pair, verified against a brute-force oracle."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    return dedup.simhash_near_dup_pairs(docs, max_hamming=3, bits=64).orderBy(
        "doc_a", "doc_b"
    )


def _sql_simhash64_pairs(max_hamming: int = 3) -> str:
    """Brute-force 64-bit oracle. The 64-bit value is built from the two
    unsigned 32-bit md5-hex halves; Java-long (two's complement) semantics
    are reproduced WITHOUT 64-bit shifts or HUGEINT: per-bit votes read
    from the unsigned halves, and the signed value is
    (hi_signed)*2^32 + lo, which spans exactly [-2^63, 2^63) with no
    BIGINT overflow."""
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hi32 = " + ".join(f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8))
    lo32 = " + ".join(f"{digit.format(p=p + 9)} * {16 ** (7 - p)}" for p in range(8))
    votes = ", ".join(
        [
            f"SUM(CASE WHEN (lo >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
            for j in range(32)
        ]
        + [
            f"SUM(CASE WHEN (hi >> {j - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
            for j in range(32, 64)
        ]
    )
    bits_lo = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32)
    )
    bits_hi = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << (j - 32)} ELSE 0 END)" for j in range(32, 64)
    )
    table = "(SELECT * FROM documents WHERE doc_id < 500)"
    return f"""
WITH {sqlgen.stopword_cte()}, {sqlgen.tokens_cte(table=table)},
hashed AS (SELECT doc_id, md5(term) AS h FROM toks),
hv AS (SELECT doc_id, CAST({hi32} AS BIGINT) AS hi, CAST({lo32} AS BIGINT) AS lo
       FROM hashed),
agg AS (SELECT doc_id, {votes} FROM hv GROUP BY doc_id),
halves AS (SELECT doc_id, CAST({bits_hi} AS BIGINT) AS bhi,
                  CAST({bits_lo} AS BIGINT) AS blo FROM agg),
sh AS (SELECT doc_id,
              (CASE WHEN bhi >= 2147483648 THEN bhi - 4294967296 ELSE bhi END)
              * 4294967296 + blo AS simhash
       FROM halves)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


SQL_SIMHASH64_PAIRS = _sql_simhash64_pairs()


# ---------------------------------------------- 13c. simhash bucket audit


SIMHASH_AUDIT_MAX_BUCKET = 8


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simhash_oversized_buckets: the no-silent-caps audit — (band, key)
    buckets larger than the cap, i.e. exactly what simhash_near_dup_pairs
    would skip. The word-soup corpus mass-collides simhashes, so a small
    cap on the 500-doc slice yields a non-trivial, bounded audit set."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 500
    )
    return dedup.simhash_oversized_buckets(
        docs, max_hamming=3, max_bucket=SIMHASH_AUDIT_MAX_BUCKET, bits=32
    ).orderBy("band", "key")


def _sql_simhash_buckets(max_bucket: int = SIMHASH_AUDIT_MAX_BUCKET) -> str:
    # same banding arithmetic as operators/dedup._simhash_bands at
    # max_hamming=3: four 8-bit bands, key = (simhash >> 8b) & 255
    base = _sql_simhash(table="(SELECT * FROM documents WHERE doc_id < 500)")
    base = base[: base.rindex("SELECT doc_id,")]  # keep the CTE chain
    # (rindex: the final projection — "SELECT doc_id," also opens the agg CTE)
    bands = "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band, (simhash >> {8 * b}) & 255 AS key FROM sh"
        for b in range(4)
    )
    return base + f""",
sh AS (SELECT doc_id, CAST((CASE WHEN v0 > 0 THEN 1 ELSE 0 END) +
  {" + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(1, 32))}
  AS BIGINT) AS simhash FROM agg),
bands AS ({bands})
SELECT CAST(band AS INTEGER) AS band, CAST(key AS BIGINT) AS key,
       CAST(COUNT(*) AS BIGINT) AS bucket_size
FROM bands GROUP BY band, key HAVING COUNT(*) > {max_bucket}
ORDER BY band, key
"""


SQL_SIMHASH_BUCKETS = _sql_simhash_buckets()


# -------------------------------------------------------- 14. n-gram jaccard


_PROBE_IDS = [0, 1, 2, 3, 4]
_PROBE_LIST = ", ".join(str(p) for p in _PROBE_IDS)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return dedup.ngram_jaccard_pairs(docs, _PROBE_IDS, threshold=0.05).orderBy(
        "probe_id", "doc_id"
    )


SQL_NGRAM_JACCARD = f"""
WITH {sqlgen.stopword_cte()},
raw AS (
  SELECT doc_id, u.i AS i, w.l[u.i] AS t
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS l FROM documents) w,
       UNNEST(generate_series(1, len(w.l))) u(i)
),
pos AS (
  SELECT doc_id, substr(t, 1, 6) AS term, MIN(i) AS fpos
  FROM raw WHERE len(t) >= 3 AND t NOT IN (SELECT w FROM stop)
  GROUP BY doc_id, substr(t, 1, 6)
),
ranked AS (SELECT doc_id, term,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fpos) AS rnk
           FROM pos),
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM ranked a
  JOIN ranked b ON a.doc_id = b.doc_id AND b.rnk = a.rnk + 1
  JOIN ranked c ON a.doc_id = c.doc_id AND c.rnk = a.rnk + 2
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
probes AS (SELECT doc_id AS probe_id, shingle FROM sh WHERE doc_id IN ({_PROBE_LIST})),
inter AS (
  SELECT p.probe_id, s.doc_id, COUNT(*) AS i
  FROM probes p JOIN sh s ON p.shingle = s.shingle AND p.probe_id < s.doc_id
  GROUP BY p.probe_id, s.doc_id
)
SELECT i.probe_id, i.doc_id,
       CAST(ROUND(i.i * 1e6 / (cp.n + cd.n - i.i)) AS BIGINT) AS jaccard_e6
FROM inter i
JOIN counts cp ON cp.doc_id = i.probe_id
JOIN counts cd ON cd.doc_id = i.doc_id
WHERE i.i * 1e6 / (cp.n + cd.n - i.i) >= 50000
ORDER BY i.probe_id, i.doc_id
"""


# ------------------------------------------------------------ 15. cosine top-k


def _probe_vec(sf_dir: str) -> list[float]:
    import duckdb

    return list(
        duckdb.sql(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' WHERE vec_id = 0"
        ).fetchone()[0]
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.cosine_topk(emb, _probe_vec(sf_dir), k=10)


SQL_COSINE_TOPK = """
WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
prod AS (
  SELECT e.vec_id,
         SUM(CAST(e.embedding[u.i] AS DOUBLE) * CAST(probe.p[u.i] AS DOUBLE)) AS dot,
         SUM(CAST(e.embedding[u.i] AS DOUBLE) * CAST(e.embedding[u.i] AS DOUBLE)) AS nq,
         SUM(CAST(probe.p[u.i] AS DOUBLE) * CAST(probe.p[u.i] AS DOUBLE)) AS np
  FROM embeddings e CROSS JOIN probe,
       UNNEST(generate_series(1, len(e.embedding))) u(i)
  GROUP BY e.vec_id
)
SELECT vec_id, CAST(ROUND(dot / (sqrt(nq) * sqrt(np)) * 1e6) AS BIGINT) AS cosine_e6
FROM prod ORDER BY cosine_e6 DESC, vec_id ASC LIMIT 10
"""


# --------------------------------------------------------- 15a-ivf. IVF ANN

_IVF_NC = 16
_IVF_NPROBE = 4


def _sql_ivf_ctes() -> str:
    """cent/vc/assign CTEs: deterministic hash-sampled coarse quantizer +
    per-vector nearest-centroid assignment (mirrors ann.ivf_centroids /
    ann.ivf_assign_col — argmax cosine, ties to the smallest cid)."""
    return f"""
cent AS (
  SELECT vec_id, embedding,
         ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
  FROM embeddings WHERE embedding IS NOT NULL
  QUALIFY cid < {_IVF_NC}
),
vc AS (
  SELECT e.vec_id, c.cid,
         SUM(CAST(e.embedding[u.i] AS DOUBLE) * CAST(c.embedding[u.i] AS DOUBLE))
           / sqrt(SUM(CAST(c.embedding[u.i] AS DOUBLE) * CAST(c.embedding[u.i] AS DOUBLE)))
           AS dot_n
  FROM embeddings e CROSS JOIN cent c,
       UNNEST(generate_series(1, len(e.embedding))) u(i)
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT vec_id, CAST(cid AS INTEGER) AS cid FROM vc
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot_n DESC, cid) = 1
)"""


def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialize-me-partitioned-by-cid inverted-list table."""
    # NOT spread: measured A/B at sf0.1 — the centroid-sample job and the
    # assignment are too small for the extra exchange to pay (plain 1.7-2.4s
    # vs spread 2.0-3.4s interleaved)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.ivf_assignments(emb, n_centroids=_IVF_NC)


SQL_IVF_ASSIGN = f"""
WITH {_sql_ivf_ctes()}
SELECT e.vec_id, a.cid
FROM embeddings e LEFT JOIN assign a USING (vec_id)
"""
# LEFT JOIN back against the corpus: a NULL embedding never reaches the
# assign CTE (UNNEST over a NULL-length series yields no rows), but the
# Spark side (ann.ivf_assignments) emits (vec_id, NULL cid) for it — the
# oracle must match row-for-row if a corpus ever carries null vectors.


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # not spread — same A/B as q_ivf_assign
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann.ivf_cosine_topk(
        emb, _probe_vec(sf_dir), k=10, n_centroids=_IVF_NC, n_probe=_IVF_NPROBE
    )


def q_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED serving path (ann.ivf_build → ann.ivf_probe_topk):
    builds the cid-partitioned index in a scratch dir, then probes it with a
    partition-pruned read. Shares ivf_topk's oracle SQL — the two library
    paths are semantically identical by construction, and this pair pins
    that through the driver gate, not just pytest."""
    import atexit
    import shutil
    import tempfile

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    index_dir = tempfile.mkdtemp(prefix="ivf_probe_")
    # scratch index is per-invocation; without cleanup, repeated bench/driver
    # runs leak corpus-sized parquet copies into the temp filesystem
    atexit.register(shutil.rmtree, index_dir, ignore_errors=True)
    cents = ann.ivf_build(emb, index_dir, n_centroids=_IVF_NC)
    return ann.ivf_probe_topk(
        spark, index_dir, _probe_vec(sf_dir), k=10, n_probe=_IVF_NPROBE,
        cents=cents,
    )


SQL_IVF_TOPK = f"""
WITH {_sql_ivf_ctes()},
probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
pc AS (
  SELECT c.cid,
         SUM(CAST(c.embedding[u.i] AS DOUBLE) * CAST(probe.p[u.i] AS DOUBLE))
           / sqrt(SUM(CAST(c.embedding[u.i] AS DOUBLE) * CAST(c.embedding[u.i] AS DOUBLE)))
           AS dot_n
  FROM cent c CROSS JOIN probe,
       UNNEST(generate_series(1, len(c.embedding))) u(i)
  GROUP BY c.cid
),
probed AS (SELECT cid FROM pc QUALIFY ROW_NUMBER() OVER (ORDER BY dot_n DESC, cid) <= {_IVF_NPROBE}),
scored AS (
  SELECT e.vec_id,
         SUM(CAST(e.embedding[u.i] AS DOUBLE) * CAST(probe.p[u.i] AS DOUBLE)) AS dot,
         SUM(CAST(e.embedding[u.i] AS DOUBLE) * CAST(e.embedding[u.i] AS DOUBLE)) AS nq,
         SUM(CAST(probe.p[u.i] AS DOUBLE) * CAST(probe.p[u.i] AS DOUBLE)) AS np
  FROM embeddings e CROSS JOIN probe,
       UNNEST(generate_series(1, len(e.embedding))) u(i)
  WHERE e.vec_id IN (SELECT a.vec_id FROM assign a JOIN probed p ON a.cid = p.cid)
  GROUP BY e.vec_id
)
SELECT vec_id, CAST(ROUND(dot / sqrt(nq * np) * 1e6) AS BIGINT) AS cosine_e6
FROM scored ORDER BY cosine_e6 DESC, vec_id LIMIT 10
"""


# ------------------------------------------ 15b. embedding near-dup pairs


_NEAR_DUP_SLICE = 500  # fixed exact-evaluation slice (all of sf0.01)


def q_embed_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs over a FIXED 500-vector slice
    (threshold 0.4 — the testdata embeddings are random normals, max pairwise
    cosine ≈ 0.51). The slice keeps the exact all-pairs oracle bounded at any
    SF (same bounded-probe pattern as ngram_jaccard); the unbounded corpus
    path is the LSH variant, ann.embedding_near_dup_pairs, pytest-verified
    against this exact operator."""
    emb = read_spread(spark, f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < _NEAR_DUP_SLICE
    )
    return ann.embedding_near_dup_pairs_exact(emb, threshold=0.4).orderBy(
        "vec_a", "vec_b"
    )


SQL_EMBED_NEAR_DUPS = f"""
WITH e AS (SELECT * FROM embeddings WHERE vec_id < {_NEAR_DUP_SLICE}),
prod AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         SUM(CAST(a.embedding[u.i] AS DOUBLE) * CAST(b.embedding[u.i] AS DOUBLE)) AS dot,
         SUM(CAST(a.embedding[u.i] AS DOUBLE) * CAST(a.embedding[u.i] AS DOUBLE)) AS na,
         SUM(CAST(b.embedding[u.i] AS DOUBLE) * CAST(b.embedding[u.i] AS DOUBLE)) AS nb
  FROM e a JOIN e b ON a.vec_id < b.vec_id,
       UNNEST(generate_series(1, len(a.embedding))) u(i)
  GROUP BY a.vec_id, b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         CAST(ROUND(dot / (sqrt(na) * sqrt(nb)) * 1e6) AS BIGINT) AS cosine_e6
  FROM prod
)
SELECT vec_a, vec_b, cosine_e6 FROM scored
WHERE cosine_e6 >= 400000 ORDER BY vec_a, vec_b
"""


# --------------------------------------------------- 15c. ngram_text (T11)


_NGT_TOKENS = 5


def q_ngram_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NGramText library transform over the documents table (functions/
    ngram_text.py): top-5 analyzer tokens by (pre-dedup frequency desc,
    first occurrence asc), space-joined."""
    from .functions.ngram_text import ngram_text_col

    # row-local transform: parallelism = input partitions (see q_fingerprint)
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return ngram_text_col(docs, num_tokens=_NGT_TOKENS).select(
        "doc_id", "ngram_text"
    ).orderBy("doc_id")


SQL_NGRAM_TEXT = f"""
WITH {sqlgen.stopword_cte()},
raw AS (
  SELECT doc_id, u.i AS i, w.l[u.i] AS t
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS l FROM documents) w,
       UNNEST(generate_series(1, len(w.l))) u(i)
),
terms AS (
  SELECT doc_id, i, substr(t, 1, 6) AS term
  FROM raw WHERE len(t) >= 3 AND t NOT IN (SELECT w FROM stop)
),
agg AS (SELECT doc_id, term, COUNT(*) AS cnt, MIN(i) AS fpos
        FROM terms GROUP BY doc_id, term),
ranked AS (SELECT doc_id, term,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, fpos ASC) AS r
           FROM agg),
joined AS (SELECT doc_id, string_agg(term, ' ' ORDER BY r) AS ngram_text
           FROM ranked WHERE r <= {_NGT_TOKENS} GROUP BY doc_id)
SELECT d.doc_id, j.ngram_text
FROM documents d LEFT JOIN joined j ON d.doc_id = j.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------------------------------ 16. langid


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    out = textstats.langid(docs)
    return out.select(
        "doc_id",
        F.col("en_hits").cast("long").alias("en_hits"),
        F.col("es_hits").cast("long").alias("es_hits"),
        F.col("pt_hits").cast("long").alias("pt_hits"),
        "lang_pred",
    )


def _lang_cte(name: str, stopset) -> str:
    vals = ", ".join(
        f"('{w}')" for w in sorted(x for x in stopset if x and " " not in x and x.isascii())
    )
    return f"{name}(w) AS (VALUES {vals})"


def _sql_langid() -> str:
    from .stopwords import ENGLISH, PORTUGUESE, SPANISH

    return f"""
WITH {_lang_cte('en_s', ENGLISH)}, {_lang_cte('es_s', SPANISH)}, {_lang_cte('pt_s', PORTUGUESE)},
words AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS t FROM documents
  )
),
hits AS (
  SELECT d.doc_id,
    (SELECT COUNT(*) FROM words w WHERE w.doc_id = d.doc_id AND w.t IN (SELECT w FROM en_s)) AS en_hits,
    (SELECT COUNT(*) FROM words w WHERE w.doc_id = d.doc_id AND w.t IN (SELECT w FROM es_s)) AS es_hits,
    (SELECT COUNT(*) FROM words w WHERE w.doc_id = d.doc_id AND w.t IN (SELECT w FROM pt_s)) AS pt_hits
  FROM documents d
)
SELECT doc_id, en_hits, es_hits, pt_hits,
  CASE WHEN greatest(en_hits, es_hits, pt_hits) = 0 THEN 'und'
       WHEN en_hits = greatest(en_hits, es_hits, pt_hits) THEN 'en'
       WHEN es_hits = greatest(en_hits, es_hits, pt_hits) THEN 'es'
       ELSE 'pt' END AS lang_pred
FROM hits
"""


SQL_LANGID = _sql_langid()


# ----------------------------------------------------------- 17. quality score


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.quality_score(docs)


def _sql_quality() -> str:
    from .stopwords import ENGLISH

    return f"""
WITH {_lang_cte('en_s', ENGLISH)},
words AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS l FROM documents),
dw AS (SELECT doc_id, COUNT(DISTINCT t) AS n_distinct,
              COUNT(DISTINCT CASE WHEN t IN (SELECT w FROM en_s) THEN t END) AS n_stop
       FROM (SELECT doc_id, unnest(l) AS t FROM words) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars_c,
       CAST(len(w.l) AS BIGINT) AS n_words,
       CAST(ROUND(dw.n_stop * 1e6 / greatest(dw.n_distinct, 1)) AS BIGINT) AS stop_ratio_e6,
       CAST(ROUND(length(regexp_replace(d.text, '[^0-9]', '', 'g')) * 1e6
            / greatest(length(d.text), 1)) AS BIGINT) AS digit_ratio_e6,
       CAST(ROUND(length(replace(d.text, ' ', '')) * 1e6 / greatest(len(w.l), 1)) AS BIGINT)
         AS mean_word_len_e6
FROM documents d JOIN words w ON d.doc_id = w.doc_id JOIN dw ON d.doc_id = dw.doc_id
"""


SQL_QUALITY = _sql_quality()


# ----------------------------------------------------------- 18. token counts


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.token_counts(docs)


SQL_TOKEN_COUNTS = f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{textstats.TOKEN_PATTERN}')) AS BIGINT)
         AS bpe_tokens
FROM documents
"""


# --------------------------------------------------- 18b. repetition signals


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.repetition_stats(docs)


SQL_REPETITION = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT doc_id, 1 AS n, unnest(ws) AS g FROM w
  UNION ALL
  SELECT doc_id, 2, unnest(list_transform(range(len(ws) - 1),
                                          i -> ws[i + 1] || ' ' || ws[i + 2]))
  FROM w WHERE len(ws) >= 2
  UNION ALL
  SELECT doc_id, 3, unnest(list_transform(range(len(ws) - 2),
                                          i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3]))
  FROM w WHERE len(ws) >= 3
),
counts AS (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY doc_id, n, g),
per_n AS (SELECT doc_id, n, CAST(round(max(c) * 1e6 / sum(c)) AS BIGINT) AS f
          FROM counts GROUP BY doc_id, n),
lc AS (
  SELECT doc_id, l, count(*) AS c, len(l) AS ch FROM (
    SELECT doc_id, trim(unnest(string_split(coalesce(text, ''), chr(10)))) AS l
    FROM documents
  ) WHERE len(l) > 0 GROUP BY doc_id, l
),
lagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
    CAST(round((sum(c) - count(*)) * 1e6 / sum(c)) AS BIGINT) AS dup_line_frac_e6,
    CAST(round(coalesce(sum(CASE WHEN c > 1 THEN c * ch END), 0) * 1e6
               / greatest(sum(c * ch), 1)) AS BIGINT) AS dup_line_char_frac_e6
  FROM lc GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(l.n_lines, 0) AS n_lines,
  coalesce(l.dup_line_frac_e6, 0) AS dup_line_frac_e6,
  coalesce(l.dup_line_char_frac_e6, 0) AS dup_line_char_frac_e6,
  coalesce(MAX(CASE WHEN p.n = 1 THEN p.f END), 0) AS top_word_frac_e6,
  coalesce(MAX(CASE WHEN p.n = 2 THEN p.f END), 0) AS top_2gram_frac_e6,
  coalesce(MAX(CASE WHEN p.n = 3 THEN p.f END), 0) AS top_3gram_frac_e6
FROM documents d
LEFT JOIN lagg l ON d.doc_id = l.doc_id
LEFT JOIN per_n p ON d.doc_id = p.doc_id
GROUP BY d.doc_id, l.n_lines, l.dup_line_frac_e6, l.dup_line_char_frac_e6
"""


# ------------------------------------------------- 18c. token-budget histogram


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.token_histogram(docs)


SQL_TOKEN_HISTOGRAM = f"""
WITH tc AS (SELECT * FROM ({SQL_TOKEN_COUNTS}) t)
SELECT CAST(length(bin(bpe_tokens + 1)) - 1 AS BIGINT) AS bucket,
       count(*) AS n_docs,
       CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM tc GROUP BY bucket ORDER BY bucket
"""


# -------------------------------------------------- 18d. quality filter gate


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.filter_documents(docs)


def _sql_quality_filter() -> str:
    # thresholds mirror textstats.filter_documents defaults (e6-scaled)
    return f"""
WITH q AS (SELECT * FROM ({_sql_quality()}) t),
r AS (SELECT * FROM ({SQL_REPETITION}) t)
SELECT q.doc_id,
  (CASE
     WHEN q.n_words < 5 THEN 'too_few_words'
     WHEN q.n_words > 100000 THEN 'too_many_words'
     WHEN r.top_word_frac_e6 > 250000 THEN 'top_word_repetition'
     WHEN r.top_2gram_frac_e6 > 200000 THEN 'top_2gram_repetition'
     WHEN r.dup_line_frac_e6 > 300000 THEN 'dup_lines'
   END) IS NULL AS keep,
  CASE
    WHEN q.n_words < 5 THEN 'too_few_words'
    WHEN q.n_words > 100000 THEN 'too_many_words'
    WHEN r.top_word_frac_e6 > 250000 THEN 'top_word_repetition'
    WHEN r.top_2gram_frac_e6 > 200000 THEN 'top_2gram_repetition'
    WHEN r.dup_line_frac_e6 > 300000 THEN 'dup_lines'
  END AS reason
FROM q JOIN r ON q.doc_id = r.doc_id
"""


SQL_QUALITY_FILTER = _sql_quality_filter()


# ------------------------------------------------------------ 19. fingerprint


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the (single-file at test SF) input first: the fingerprint plan
    # is row-local by design (no shuffle of its own), so compute parallelism
    # equals input-partition count; a real multi-file table scans wide and
    # skips the exchange (util.spread_input)
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.fingerprint(docs).orderBy("doc_id")


SQL_FINGERPRINT = """
WITH sh AS (
  SELECT DISTINCT doc_id, md5(substr(text, u.i, 8)) AS h
  FROM documents d,
       UNNEST(generate_series(1, greatest(length(d.text) - 8, 0) + 1)) u(i)
)
SELECT doc_id, array_to_string((list_sort(list(DISTINCT h)))[1:4], '') AS fp
FROM sh GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------------- 20. multimodal feature plumbing


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.docs_as_media(docs)
    feats = multimodal.decode_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.element_at("features", 1).cast("long").alias("f0"),
        F.element_at("features", 2).cast("long").alias("f1"),
        F.element_at("features", 3).cast("long").alias("f2"),
    )


def _sql_media() -> str:
    # fake features: f0 = n_bytes % 997; f1 = sum of md5-digest bytes 0..3;
    # f2 = bytes 4..7. digest byte k = hex pair (2k+1, 2k+2)
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    def byte(k: int) -> str:
        return f"({digit.format(p=2 * k + 1)} * 16 + {digit.format(p=2 * k + 2)})"

    f1 = " + ".join(byte(k) for k in range(0, 4))
    f2 = " + ".join(byte(k) for k in range(4, 8))
    return f"""
WITH m AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
                  md5(text) AS h FROM documents)
SELECT media_id, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(n_bytes % 997 AS BIGINT) AS f0,
       CAST({f1} AS BIGINT) AS f1,
       CAST({f2} AS BIGINT) AS f2
FROM m
"""


SQL_MEDIA_FEATURES = _sql_media()


# ------------------------------------------------------- 21. dedup ACTION


def q_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level dedup action (exact part — the SQL-expressible half; the
    LSH connected-component half is pytest-verified in test_dedup_action):
    the deduplicated documents table a training pipeline consumes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        dedup.deduplicate(docs, near=False)
        .select("doc_id", "source", "lang", F.length("text").cast("long").alias("n_chars_c"))
        .orderBy("doc_id")
    )


SQL_DEDUP_DOCS = """
WITH k AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT d.doc_id, d.source, d.lang, CAST(length(d.text) AS BIGINT) AS n_chars_c
FROM documents d JOIN k ON d.doc_id = k.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------ 21b. corpus top n-grams / mixture


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 trigrams (boilerplate discovery) — two-phase
    hashed heavy hitters; final (cnt DESC, gram ASC) order is total, so
    the LIMIT cut is cross-engine deterministic."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.top_ngrams(docs, n=3, k=20)


SQL_TOP_NGRAMS = """
WITH w AS (
  SELECT list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(range(len(ws) - 2),
                               i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         AS gram
  FROM w WHERE len(ws) >= 3
),
cnt AS (SELECT gram, count(*) AS c FROM grams GROUP BY gram),
kth AS (SELECT min(c) AS m FROM (SELECT c FROM cnt ORDER BY c DESC LIMIT 20))
SELECT gram, CAST(c AS BIGINT) AS cnt
FROM cnt, kth WHERE c >= m
ORDER BY cnt DESC, gram LIMIT 20
"""


def q_top_ngrams_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-candidate top-20 trigrams: phase 1 shuffles only the
    deterministic 20% occurrence sample (md5-keyed, the sampling.py
    convention DuckDB replays digit-by-digit), phase 2 exact-counts the
    candidates. Reported counts are exact; candidate selection is the
    only approximation."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return textstats.top_ngrams_approx(docs, n=3, k=20, p=0.2)


def _sql_top_ngrams_approx() -> str:
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hexval = " + ".join(
        f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8)
    )
    cut = int(round(0.2 * 2**32))
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(list_transform(range(len(ws) - 2),
           i -> {{'pos': i,
                  'gram': ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]}})) AS o
  FROM w WHERE len(ws) >= 3
),
keyed AS (
  SELECT o.gram AS gram,
         md5('42|' || CAST(doc_id AS VARCHAR) || ':' ||
             CAST(o.pos AS VARCHAR) || ':' || o.gram) AS h
  FROM occ
),
sampled AS (SELECT gram FROM keyed WHERE {hexval} < {cut}),
scnt AS (SELECT gram, count(*) AS c FROM sampled GROUP BY gram),
bound AS (SELECT min(c) AS m FROM (SELECT c FROM scnt ORDER BY c DESC LIMIT 80)),
cand AS (SELECT gram FROM scnt, bound WHERE c >= m),
grams AS (
  SELECT unnest(list_transform(range(len(ws) - 2),
                               i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         AS gram
  FROM w WHERE len(ws) >= 3
)
SELECT g.gram, CAST(count(*) AS BIGINT) AS cnt
FROM grams g JOIN cand USING (gram)
GROUP BY g.gram
ORDER BY cnt DESC, gram LIMIT 20
"""


SQL_TOP_NGRAMS_APPROX = _sql_top_ngrams_approx()


def q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return textstats.mixture_summary(docs)


SQL_MIXTURE = f"""
WITH tc AS (
  SELECT source, lang,
         len(regexp_extract_all(lower(coalesce(text, '')), '{{pat}}')) AS toks
  FROM documents
),
per AS (SELECT source, lang, count(*) AS n_docs,
               sum(toks) AS bpe FROM tc GROUP BY source, lang)
SELECT source, lang, n_docs, CAST(bpe AS BIGINT) AS bpe_tokens,
  CAST(round(bpe * 1e6 / (SELECT sum(bpe) FROM per)) AS BIGINT)
    AS token_share_e6
FROM per
""".replace("{pat}", textstats.TOKEN_PATTERN)


# -------------------------------------- 21c. bigram-LM perplexity (CCNet gate)


def q_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-perplexity of every document under an add-one bigram LM fit
    on the corpus itself — per-term e6-rounded nll so every aggregate is
    an integer sum (order-independent, cross-engine exact)."""
    from similardocs_spark.operators.lm import bigram_lm_scores

    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return bigram_lm_scores(docs).orderBy("doc_id")


SQL_LM_SCORES = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
toks AS (SELECT unnest(ws) AS t FROM w),
uni AS (SELECT t, count(*) AS c1 FROM toks GROUP BY t),
v AS (SELECT count(*) AS vocab FROM uni),
bis AS (
  SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
           i -> {'w1': ws[i+1], 'g': ws[i+1] || ' ' || ws[i+2]})) AS o
  FROM w WHERE len(ws) >= 2
),
big AS (SELECT o.g AS g, count(*) AS c2 FROM bis GROUP BY g),
terms AS (
  SELECT b.doc_id,
         CAST(ROUND((log2(u.c1 + v.vocab) - log2(bg.c2 + 1)) * 1e6) AS BIGINT)
           AS nll
  FROM bis b JOIN big bg ON b.o.g = bg.g JOIN uni u ON b.o.w1 = u.t
  CROSS JOIN v
),
per AS (SELECT doc_id, count(*) AS nb, SUM(nll) AS s FROM terms GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(per.s, 0) AS BIGINT) AS nll_e6,
       CAST(ROUND(per.s * 1.0 / per.nb) AS BIGINT) AS xent_e6
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def q_lm_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram stupid-backoff self-perplexity (Brants et al. 2007). The
    self-trained case never reaches the backoff branches (every observed
    trigram has count ≥ 1) — the branches are pytest-exercised with a
    disjoint reference corpus; here the oracle replays the full CASE."""
    from similardocs_spark.operators.lm import trigram_backoff_scores

    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return trigram_backoff_scores(docs).orderBy("doc_id")


def _sql_lm_trigram() -> str:
    import math

    la = math.log2(1.0 / 0.4)
    return f"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
konst AS (
  SELECT SUM(len(ws)) AS t,
         (SELECT count(DISTINCT tok) FROM (SELECT unnest(ws) AS tok FROM w)) AS v
  FROM w
),
toks AS (SELECT unnest(ws) AS t FROM w),
uni AS (SELECT t, count(*) AS c1 FROM toks GROUP BY t),
bis AS (
  SELECT unnest(list_transform(range(len(ws) - 1),
           i -> ws[i+1] || ' ' || ws[i+2])) AS g
  FROM w WHERE len(ws) >= 2
),
big AS (SELECT g, count(*) AS c2 FROM bis GROUP BY g),
tris AS (
  SELECT unnest(list_transform(range(len(ws) - 2),
           i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS g
  FROM w WHERE len(ws) >= 3
),
tri AS (SELECT g, count(*) AS c3 FROM tris GROUP BY g),
stream AS (
  SELECT doc_id, unnest(list_transform(range(len(ws) - 2),
           i -> {{'tri': ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3],
                  'ctx': ws[i+1] || ' ' || ws[i+2],
                  'bi':  ws[i+2] || ' ' || ws[i+3],
                  'w1':  ws[i+3],
                  'w1p': ws[i+2]}})) AS o
  FROM w WHERE len(ws) >= 3
),
terms AS (
  SELECT s.doc_id,
    CAST(ROUND(1e6 * CASE
      WHEN COALESCE(t3.c3, 0) > 0 THEN log2(b2p.c2) - log2(t3.c3)
      WHEN COALESCE(b2.c2, 0) > 0 THEN {la!r} + log2(u1p.c1) - log2(b2.c2)
      ELSE {2 * la!r} + log2(k.t + k.v) - log2(COALESCE(u1.c1, 0) + 1)
    END) AS BIGINT) AS nll
  FROM stream s
  LEFT JOIN tri t3  ON s.o.tri = t3.g
  LEFT JOIN big b2p ON s.o.ctx = b2p.g
  LEFT JOIN big b2  ON s.o.bi  = b2.g
  LEFT JOIN uni u1  ON s.o.w1  = u1.t
  LEFT JOIN uni u1p ON s.o.w1p = u1p.t
  CROSS JOIN konst k
),
per AS (SELECT doc_id, count(*) AS nt, SUM(nll) AS s FROM terms GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.nt, 0) AS BIGINT) AS n_terms,
       CAST(COALESCE(per.s, 0) AS BIGINT) AS nll_e6,
       CAST(ROUND(per.s * 1.0 / per.nt) AS BIGINT) AS xent_e6
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


SQL_LM_TRIGRAM = _sql_lm_trigram()


# --------------------------------------------- 22. benchmark decontamination


def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents table. The "benchmark"
    is derived deterministically from the corpus itself (every 41st doc_id
    contributes a 12-token excerpt starting at its 2nd token), so the pair
    is self-contained: those excerpts' 8-gram shingles must flag exactly
    their source docs plus any true coincidental overlap — both engines
    compute the same set."""
    from .operators import decontam

    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[ \n]+"),
        lambda x: F.length(x) > 0,
    )
    bench = docs.filter(F.col("doc_id") % 41 == 0).select(
        F.concat_ws(" ", F.slice(toks, 2, 12)).alias("text")
    )
    return decontam.decontaminate(docs, bench, n=8)


SQL_DECONTAM = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
bw AS (SELECT list_slice(ws, 2, 13) AS bs FROM w WHERE doc_id % 41 = 0),
bgrams AS (
  SELECT DISTINCT array_to_string(list_slice(bs, i + 1, i + 8), ' ') AS g
  FROM (SELECT bs, unnest(range(len(bs) - 7)) AS i FROM bw WHERE len(bs) >= 8)
),
dgrams AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(ws, i + 1, i + 8), ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 7)) AS i FROM w
        WHERE len(ws) >= 8)
),
ng AS (SELECT doc_id, count(*) AS n_grams FROM dgrams GROUP BY doc_id),
hits AS (SELECT dg.doc_id, count(*) AS n_hits
         FROM dgrams dg JOIN bgrams b ON dg.g = b.g GROUP BY dg.doc_id)
SELECT d.doc_id,
  CAST(coalesce(ng.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
  coalesce(hits.n_hits, 0) >= 1 AS contaminated
FROM documents d
LEFT JOIN ng ON d.doc_id = ng.doc_id
LEFT JOIN hits ON d.doc_id = hits.doc_id
"""


# -------------------------------------------------- 22b. sequence packing


def q_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing offsets over the documents table's BPE-ish token counts —
    the Spark side runs the distributed two-level prefix sum
    (range-partitioned local cumsums + broadcast partition offsets), the
    oracle the textbook single-stream window; identical output is the
    point (the distributed plan IS a global running sum)."""
    from .operators.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tc = textstats.token_counts(docs).select("doc_id", "bpe_tokens")
    return pack_sequences(tc, seq_len=256, tokens_col="bpe_tokens")


SQL_PACKING = f"""
WITH tc AS (SELECT * FROM ({SQL_TOKEN_COUNTS}) t),
c AS (
  SELECT doc_id, bpe_tokens AS tk,
         sum(bpe_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tc
)
SELECT doc_id,
  CAST(cum - tk AS BIGINT) AS start_tok,
  CAST((cum - tk) // 256 AS BIGINT) AS seq_first,
  CAST(CASE WHEN tk > 0 THEN (cum - 1) // 256
            ELSE (cum - tk) // 256 END AS BIGINT) AS seq_last,
  CAST(CASE WHEN tk > 0 THEN (cum - 1) // 256
            ELSE (cum - tk) // 256 END
       - (cum - tk) // 256 + 1 AS BIGINT) AS n_seqs
FROM c
"""


def q_shuffled_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline step: shuffle_order assigns the epoch
    order, pack_sequences packs the SHUFFLED token stream (ordinal as
    the packing key). Returns original doc_id + its ordinal + packing
    offsets, so the oracle replays the whole composition."""
    from .operators.packing import pack_sequences
    from .operators.sampling import shuffle_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tc = textstats.token_counts(docs).select("doc_id", "bpe_tokens")
    ords = shuffle_order(docs)
    stream = tc.join(ords, "doc_id").select(
        F.col("ord"), F.col("doc_id"), F.col("bpe_tokens")
    )
    packed = pack_sequences(
        stream, seq_len=256, id_col="ord", tokens_col="bpe_tokens"
    )
    return (
        stream.select("doc_id", "ord")
        .join(packed, "ord")
        .select("doc_id", "ord", "start_tok", "seq_first", "seq_last", "n_seqs")
        .orderBy("doc_id")
    )


def _sql_shuffled_packing() -> str:
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hexval = " + ".join(
        f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8)
    )
    return f"""
WITH tc AS (SELECT * FROM ({{SQL_TOKEN_COUNTS}}) t),
hh AS (
  SELECT doc_id, md5('42|' || CAST(doc_id AS VARCHAR)) AS h FROM documents
),
u AS (SELECT doc_id, {hexval} AS u32 FROM hh),
o AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY u32, doc_id) - 1 AS BIGINT) AS ord
  FROM u
),
c AS (
  SELECT o.doc_id, o.ord, tc.bpe_tokens AS tk,
         sum(tc.bpe_tokens) OVER (ORDER BY o.ord
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM o JOIN tc ON o.doc_id = tc.doc_id
)
SELECT doc_id, ord,
  CAST(cum - tk AS BIGINT) AS start_tok,
  CAST((cum - tk) // 256 AS BIGINT) AS seq_first,
  CAST(CASE WHEN tk > 0 THEN (cum - 1) // 256
            ELSE (cum - tk) // 256 END AS BIGINT) AS seq_last,
  CAST(CASE WHEN tk > 0 THEN (cum - 1) // 256
            ELSE (cum - tk) // 256 END
       - (cum - tk) // 256 + 1 AS BIGINT) AS n_seqs
FROM c ORDER BY doc_id
"""


SQL_SHUFFLED_PACKING = _sql_shuffled_packing().replace(
    "{SQL_TOKEN_COUNTS}", SQL_TOKEN_COUNTS
)


# -------------------------------------------------- 22c. deterministic sample


def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample over documents: src0 at 80%, src1
    at 30%, everything else at 10% — membership is md5-derived, so the
    oracle re-derives the exact same sample (not just the same size)."""
    from .operators.sampling import sample_stratified

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_stratified(
        docs, {"src0": 0.8, "src1": 0.3}, by="source", default_rate=0.1
    ).select("doc_id", "source", "lang")


def _sql_sample() -> str:
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hexval = " + ".join(
        f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8)
    )
    def cut(r: float) -> int:
        return int(round(r * 2**32))

    return f"""
WITH h AS (
  SELECT doc_id, source, lang,
         md5('42|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
u AS (SELECT doc_id, source, lang, {hexval} AS u32 FROM h)
SELECT doc_id, source, lang FROM u
WHERE u32 < CASE WHEN source = 'src0' THEN {cut(0.8)}
                 WHEN source = 'src1' THEN {cut(0.3)}
                 ELSE {cut(0.1)} END
"""


SQL_SAMPLE = _sql_sample()


def q_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order ordinal for every document —
    distributed two-level prefix sum over (md5-u32, doc_id) rank; the
    oracle replays the identical permutation with a window."""
    from .operators.sampling import shuffle_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shuffle_order(docs).orderBy("doc_id")


def _sql_shuffle_order() -> str:
    digit = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"
    hexval = " + ".join(
        f"{digit.format(p=p + 1)} * {16 ** (7 - p)}" for p in range(8)
    )
    return f"""
WITH h AS (
  SELECT doc_id, md5('42|' || CAST(doc_id AS VARCHAR)) AS h FROM documents
),
u AS (SELECT doc_id, {hexval} AS u32 FROM h)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY u32, doc_id) - 1 AS BIGINT) AS ord
FROM u ORDER BY doc_id
"""


SQL_SHUFFLE_ORDER = _sql_shuffle_order()


# ----------------------------------------------------- 23. PII detect/redact


def _docs_with_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically inject PII into every 11th doc (the corpus itself
    carries none) so the pair exercises real matches in both engines."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ref 123456789"),
    )
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, injected).otherwise(F.col("text")),
    )


def q_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import privacy

    return privacy.pii_stats(_docs_with_pii(spark, sf_dir))


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted text itself is the output — string-hash parity pins that
    the Java and RE2 regex engines replace identically."""
    from .operators import privacy

    return privacy.pii_redact(_docs_with_pii(spark, sf_dir))


_SQL_PII_SRC = """
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com from 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.7 ref 123456789'
              ELSE text END AS text
  FROM documents
"""

def _sql_pii() -> str:
    # generated from privacy.PII_PATTERNS — one source of truth for the
    # regexes (DuckDB single-quoted literals pass backslashes through, and
    # the patterns are RE2/Java-common by the module's contract)
    from .operators.privacy import PII_PATTERNS

    count = "len(regexp_extract_all(coalesce(text, ''), '{p}'))"
    cols = ",\n  ".join(
        "CAST(" + count.format(p=pat) + f" AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS
    )
    total = " + ".join(count.format(p=pat) for _, pat in PII_PATTERNS)
    return (
        f"WITH src AS ({_SQL_PII_SRC})\n"
        f"SELECT doc_id,\n  {cols},\n  ({total}) > 0 AS has_pii\nFROM src"
    )


def _sql_pii_redact() -> str:
    from .operators.privacy import PII_PATTERNS

    expr = "coalesce(text, '')"
    for name, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return f"WITH src AS ({_SQL_PII_SRC})\nSELECT doc_id, {expr} AS text FROM src"


SQL_PII = _sql_pii()
SQL_PII_REDACT = _sql_pii_redact()


# ------------------------------------------------ 26. duplicate-span dedup


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span statistics over the documents table (stride-1
    20-token window hashing — the Spark-shardable form of Lee et al.'s
    suffix-array ExactSubstr; the sf corpora contain natural near-dup
    plants, so real duplicated windows exist at every sf)."""
    from .operators.spandedup import duplicate_spans

    # spread the (single-file at test SF) input: the window projection is
    # row-local; compute parallelism = input partitions (see q_fingerprint)
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return duplicate_spans(docs, n=20)


# The oracle groups by the window TEXT where Spark groups by its xxhash64
# (the engine's established pre-shuffle hashing convention — repetition,
# decontam); coverage is the same merged-interval fold, via lag() instead
# of Spark's row-local aggregate over sorted positions.
SQL_DUP_SPANS = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[ \n]+'),
                     x -> len(x) > 0) AS ws
  FROM documents
),
wins AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(ws, i + 1, i + 20), ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 19)) AS i
        FROM w WHERE len(ws) >= 20)
),
dup AS (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2),
steps AS (
  SELECT doc_id, least(20, pos - coalesce(
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos - 20)) AS st
  FROM wins JOIN dup USING (g)
),
cov AS (
  SELECT doc_id, count(*) AS n_dup_windows, sum(st) AS dup_tokens
  FROM steps GROUP BY doc_id
)
SELECT w.doc_id,
  CAST(len(ws) AS BIGINT) AS n_tokens,
  CAST(greatest(len(ws) - 19, 0) AS BIGINT) AS n_windows,
  CAST(coalesce(cov.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
  CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST(round(coalesce(cov.dup_tokens, 0) * 1e6
             / greatest(len(ws), 1)) AS BIGINT) AS dup_token_frac_e6
FROM w LEFT JOIN cov ON w.doc_id = cov.doc_id
"""


# ---------------------------------------------- 26b. duplicate-span removal


def q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal ACTION: every non-canonical occurrence of a duplicated
    20-token window is stripped, the (doc_id, pos)-minimal copy survives;
    untouched docs keep byte-identical text. Both the rewritten STRINGS
    and the drop counts are oracle-checked."""
    from .operators.spandedup import strip_duplicate_spans

    # spread the single-file input (row-local window projection; see
    # q_fingerprint for the rationale)
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    return strip_duplicate_spans(docs, n=20)


SQL_STRIP_SPANS = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[ \n]+'),
                     x -> len(x) > 0) AS ws,
         list_filter(regexp_split_to_array(coalesce(text, ''), '[ \n]+'),
                     x -> len(x) > 0) AS ts
  FROM documents
),
wins AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(ws, i + 1, i + 20), ' ') AS g
  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 19)) AS i
        FROM w WHERE len(ws) >= 20)
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY g) AS c
  FROM wins
),
dropwin AS (SELECT doc_id, pos FROM ranked WHERE c >= 2 AND rn > 1),
tok AS (
  SELECT doc_id, unnest(ts) AS t, unnest(range(len(ts))) AS i FROM w
),
dropped AS (
  SELECT DISTINCT tok.doc_id, tok.i
  FROM tok JOIN dropwin d
    ON tok.doc_id = d.doc_id AND tok.i >= d.pos AND tok.i < d.pos + 20
),
kept AS (
  SELECT tok.doc_id,
         coalesce(string_agg(tok.t, ' ' ORDER BY tok.i)
                  FILTER (WHERE dropped.i IS NULL), '') AS new_text,
         count(*) FILTER (WHERE dropped.i IS NULL) AS n_kept,
         count(*) AS n_toks
  FROM tok LEFT JOIN dropped
    ON tok.doc_id = dropped.doc_id AND tok.i = dropped.i
  GROUP BY tok.doc_id
),
affected AS (SELECT DISTINCT doc_id FROM dropwin)
SELECT d.doc_id, d.lang, d.source, d.n_chars,
  CASE WHEN a.doc_id IS NULL THEN d.text ELSE k.new_text END AS text,
  CAST(CASE WHEN a.doc_id IS NULL THEN 0
            ELSE k.n_toks - k.n_kept END AS BIGINT) AS n_dropped_tokens
FROM documents d
LEFT JOIN affected a ON d.doc_id = a.doc_id
LEFT JOIN kept k ON d.doc_id = k.doc_id
"""


# ---------------------------------------------------- 27. sessionization


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events table (30-minute silence
    splits a user's activity): one exchange on user_id, window lag for
    boundaries, running-sum ordinals, co-partitioned aggregation.
    Durations are integer microseconds — cross-engine exact."""
    from .operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_minutes=30)


_SESS_GAP_US = 30 * 60_000_000

SQL_SESSIONIZE = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
f AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {_SESS_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, us,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
  FROM f
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       make_timestamp(min(us)) AS session_start,
       make_timestamp(max(us)) AS session_end,
       count(*) AS n_events,
       CAST(max(us) - min(us) AS BIGINT) AS duration_us
FROM s GROUP BY user_id, session_seq
"""


OPS_QUERIES = {
    "exact_dedup": q_exact_dedup,
    "dedup_docs": q_dedup_docs,
    "minhash_pairs": q_minhash_pairs,
    "minhash_incremental": q_minhash_incremental,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "simhash_buckets": q_simhash_buckets,
    "simhash64_pairs": q_simhash64_pairs,
    "ngram_jaccard": q_ngram_jaccard,
    "cosine_topk": q_cosine_topk,
    "ivf_assign": q_ivf_assign,
    "ivf_topk": q_ivf_topk,
    "ivf_probe": q_ivf_probe,
    "embed_near_dups": q_embed_near_dups,
    "ngram_text": q_ngram_text,
    "langid": q_langid,
    "quality": q_quality,
    "token_counts": q_token_counts,
    "repetition": q_repetition,
    "token_histogram": q_token_histogram,
    "quality_filter": q_quality_filter,
    "fingerprint": q_fingerprint,
    "media_features": q_media_features,
    "decontam": q_decontam,
    "top_ngrams": q_top_ngrams,
    "top_ngrams_approx": q_top_ngrams_approx,
    "mixture": q_mixture,
    "lm_scores": q_lm_scores,
    "lm_trigram": q_lm_trigram,
    "pii": q_pii,
    "pii_redact": q_pii_redact,
    "packing": q_packing,
    "shuffled_packing": q_shuffled_packing,
    "sample": q_sample,
    "shuffle_order": q_shuffle_order,
    "dup_spans": q_dup_spans,
    "strip_spans": q_strip_spans,
    "sessionize": q_sessionize,
}

OPS_SQL = {
    "exact_dedup": SQL_EXACT_DEDUP,
    "dedup_docs": SQL_DEDUP_DOCS,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "minhash_incremental": SQL_MINHASH_INCREMENTAL,
    "simhash": SQL_SIMHASH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "simhash_buckets": SQL_SIMHASH_BUCKETS,
    "simhash64_pairs": SQL_SIMHASH64_PAIRS,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "cosine_topk": SQL_COSINE_TOPK,
    "ivf_assign": SQL_IVF_ASSIGN,
    "ivf_topk": SQL_IVF_TOPK,
    "ivf_probe": SQL_IVF_TOPK,
    "embed_near_dups": SQL_EMBED_NEAR_DUPS,
    "ngram_text": SQL_NGRAM_TEXT,
    "langid": SQL_LANGID,
    "quality": SQL_QUALITY,
    "token_counts": SQL_TOKEN_COUNTS,
    "repetition": SQL_REPETITION,
    "token_histogram": SQL_TOKEN_HISTOGRAM,
    "quality_filter": SQL_QUALITY_FILTER,
    "fingerprint": SQL_FINGERPRINT,
    "media_features": SQL_MEDIA_FEATURES,
    "decontam": SQL_DECONTAM,
    "top_ngrams": SQL_TOP_NGRAMS,
    "top_ngrams_approx": SQL_TOP_NGRAMS_APPROX,
    "mixture": SQL_MIXTURE,
    "lm_scores": SQL_LM_SCORES,
    "lm_trigram": SQL_LM_TRIGRAM,
    "pii": SQL_PII,
    "pii_redact": SQL_PII_REDACT,
    "packing": SQL_PACKING,
    "shuffled_packing": SQL_SHUFFLED_PACKING,
    "sample": SQL_SAMPLE,
    "shuffle_order": SQL_SHUFFLE_ORDER,
    "dup_spans": SQL_DUP_SPANS,
    "strip_spans": SQL_STRIP_SPANS,
    "sessionize": SQL_SESSIONIZE,
}
