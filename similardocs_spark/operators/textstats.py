"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side (built-in functions) except the
fingerprint shingle hashing, which is md5 (cross-engine stable).
"""
from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..stopwords import ENGLISH, PORTUGUESE, SPANISH

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _lang_rows() -> list[tuple[str, str]]:
    out = []
    for lang, stopset in (("en", ENGLISH), ("es", SPANISH), ("pt", PORTUGUESE)):
        out.extend(
            (w, lang)
            for w in sorted(x for x in stopset if x and " " not in x and x.isascii())
        )
    return out


def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: distinct words matched against
    each language's stopword list (broadcast join — no giant literal arrays in
    the plan); argmax with (en, es, pt) tie order, 'und' when nothing matches."""
    spark = docs.sparkSession
    stop_df = F.broadcast(spark.createDataFrame(_lang_rows(), "w string, lang string"))
    words = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " +"))).alias("w"),
    )
    hits = (
        words.join(stop_df, "w")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("en_hits"),
            F.sum(F.when(F.col("lang") == "es", 1).otherwise(0)).alias("es_hits"),
            F.sum(F.when(F.col("lang") == "pt", 1).otherwise(0)).alias("pt_hits"),
        )
    )
    d = (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .fillna(0, ["en_hits", "es_hits", "pt_hits"])
    )
    best = F.greatest("en_hits", "es_hits", "pt_hits")
    pred = (
        F.when(best == 0, "und")
        .when(F.col("en_hits") == best, "en")
        .when(F.col("es_hits") == best, "es")
        .otherwise("pt")
    )
    return d.select("doc_id", "en_hits", "es_hits", "pt_hits", pred.alias("lang_pred"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + combined score:
    length, word count, mean word length, stopword ratio, digit ratio."""
    words = F.split(F.trim(F.col(text_col)), " +")
    stop_arr = F.array(
        *[F.lit(w) for w in sorted(x for x in ENGLISH if " " not in x and x.isascii())]
    )
    d = (
        docs.withColumn("n_chars_c", F.length(text_col).cast("long"))
        .withColumn("n_words", F.size(words).cast("long"))
        .withColumn(
            "stop_ratio_e6",
            F.round(
                F.size(F.array_intersect(F.array_distinct(words), stop_arr))
                * 1e6
                / F.greatest(F.size(F.array_distinct(words)), F.lit(1)),
            ).cast("long"),
        )
        .withColumn(
            "digit_ratio_e6",
            F.round(
                F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
                * 1e6
                / F.greatest(F.length(text_col), F.lit(1)),
            ).cast("long"),
        )
        .withColumn(
            "mean_word_len_e6",
            F.round(
                (F.length(F.regexp_replace(F.col(text_col), " ", "")))
                * 1e6
                / F.greatest(F.size(words), F.lit(1)),
            ).cast("long"),
        )
    )
    return d.select(
        "doc_id", "n_chars_c", "n_words", "stop_ratio_e6", "digit_ratio_e6",
        "mean_word_len_e6",
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per doc (training-data token
    accounting)."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), " +")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0))
        .cast("long")
        .alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 4) -> DataFrame:
    """Bottom-k sketch fingerprint over 8-char shingles (winnowing-style):
    fp = concat of the k smallest distinct md5(shingle) values — robust to
    small edits. Arrow-batched pandas UDF (hashlib md5 == engine md5)."""

    @pandas_udf(T.StringType())
    def fp_udf(texts):
        def fp(t: str) -> str:
            t = t or ""
            hs = {
                hashlib.md5(t[i : i + 8].encode()).hexdigest()
                for i in range(0, max(len(t) - 8, 0) + 1)
            }
            return "".join(sorted(hs)[:k])

        return texts.map(fp)

    return docs.select("doc_id", fp_udf(F.col(text_col)).alias("fp"))
