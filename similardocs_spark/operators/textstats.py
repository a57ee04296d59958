"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side (built-in functions) except the
fingerprint shingle hashing, which is md5 (cross-engine stable).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..stopwords import ENGLISH, PORTUGUESE, SPANISH

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _hits(words_col, stopset: frozenset[str]):
    lst = sorted(w for w in stopset if w and " " not in w and w.isascii())
    return F.size(F.array_intersect(words_col, F.array(*[F.lit(w) for w in lst])))


def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: distinct words matched against
    each language's stopword list; argmax with (en, es, pt) tie order, 'und'
    when nothing matches."""
    words = F.array_distinct(F.split(F.lower(F.col(text_col)), " +"))
    d = docs.withColumn("_w", words).select(
        "doc_id",
        _hits(F.col("_w"), ENGLISH).alias("en_hits"),
        _hits(F.col("_w"), SPANISH).alias("es_hits"),
        _hits(F.col("_w"), PORTUGUESE).alias("pt_hits"),
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
    fp = concat of the k smallest md5(shingle) values — robust to small edits."""
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.length(text_col) - 8, F.lit(0))
                ),
                lambda i: F.md5(F.col(text_col).substr(i + 1, F.lit(8))),
            )
        ).alias("h"),
    )
    return (
        sh.groupBy("doc_id")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins"))
        .select("doc_id", F.concat_ws("", "mins").alias("fp"))
    )
