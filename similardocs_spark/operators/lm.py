"""N-gram language-model perplexity scoring — the CCNet-style quality
gate (Wenzek et al. 2020: score web text with a reference-corpus LM and
keep the low-perplexity head; GPT-3 and LLaMA pipelines filter the same
way). KenLM's role is played by an add-one-smoothed bigram model, which
— unlike a 5-gram Kneser-Ney — is expressible as pure DataFrame ops
with integer-exact cross-engine semantics.

Model: p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V) over the LM corpus's
lowercased ws-split token stream (the engine's shared convention), with
V = exact distinct-word count. Per-document score = the sum of e6-scaled
negative log2 probabilities of its bigrams:

    nll(b) = round((log2(c1 + V) - log2(c2 + 1)) * 1e6)  as BIGINT

The e6 rounding happens PER TERM, so every downstream aggregate is an
INTEGER sum — order-independent and bit-identical across engines (a
float sum's value depends on accumulation order, which a shuffled
groupBy does not pin; the cosine_topk oracle rounds once at the end
only because its fold runs in array order on both engines).

Scale shape:
- Count tables shuffle bare xxhash64 longs (words and bigrams hash
  row-locally pre-exchange, the engine's standard narrow-shuffle move);
  the tables themselves are vocab-sized, not corpus-sized.
- The scoring pass explodes each doc's bigrams once and hash-joins the
  two count tables; AQE broadcasts them when they fit, else the joins
  co-partition on the hash key. No driver-side iteration; V is one
  model-sized count job on the cached unigram table.
- A 2^-64 xxhash64 collision merges two counts (same accepted risk as
  repetition_stats / top_ngrams; the DuckDB oracle counts by string and
  agrees unless a collision actually fires).

`lm_docs` defaults to scoring docs against themselves (self-perplexity:
boilerplate and template text score LOW, gibberish HIGH); pass a clean
reference corpus for CCNet-style filtering.

Output: (doc_id, n_bigrams, nll_e6, xent_e6) — xent_e6 is the e6-scaled
mean bigram cross-entropy (null when the doc has < 2 tokens), i.e.
log2(perplexity) * 1e6; filter on it with operators/textstats.
filter_documents-style composition.

Reference parity: the reference engine has no LM surface — part of the
beyond-reference training-pipeline family (COVERAGE.md).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_lm_scores"]


def _tokens(text_col):
    return F.filter(
        F.split(F.lower(F.coalesce(text_col, F.lit(""))), "[ \n]+"),
        lambda x: F.length(x) > 0,
    )


def _bigram_strings(text_col):
    """Row-local stride-1 bigram strings (the n=2 zip chain — the
    measured-fastest gram projection form, GRAM_FORM_AB.json)."""
    w = _tokens(text_col)
    L = F.greatest(F.size(w) - 1, F.lit(0))
    return F.zip_with(
        F.slice(w, 1, L),
        F.slice(w, 2, L),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document add-one bigram cross-entropy under an LM fit on
    `lm_docs` (default: `docs` itself). See module docstring."""
    if lm_docs is None:
        lm_docs = docs

    lm_toks = lm_docs.select(
        F.explode(F.transform(_tokens(F.col(text_col)), lambda t: F.xxhash64(t))).alias(
            "h1"
        )
    )
    uni = lm_toks.groupBy("h1").agg(F.count("*").alias("c1"))
    uni = uni.persist()
    vocab = uni.count()  # exact V; model-sized job on the cached table

    lm_bis = lm_docs.select(
        F.explode(
            F.transform(_bigram_strings(F.col(text_col)), lambda g: F.xxhash64(g))
        ).alias("h2")
    )
    big = lm_bis.groupBy("h2").agg(F.count("*").alias("c2"))

    w = _tokens(F.col(text_col))
    L = F.greatest(F.size(w) - 1, F.lit(0))
    stream = docs.select(
        F.col(id_col),
        F.posexplode(
            F.arrays_zip(
                F.transform(_bigram_strings(F.col(text_col)), lambda g: F.xxhash64(g))
                .alias("h2"),
                F.transform(F.slice(w, 1, L), lambda t: F.xxhash64(t)).alias("h1"),
            )
        ).alias("pos", "z"),
    ).select(id_col, F.col("z.h2").alias("h2"), F.col("z.h1").alias("h1"))

    # unseen words/bigrams (lm_docs != docs) smooth to c = 0
    scored = (
        stream.join(big, "h2", "left")
        .join(uni, "h1", "left")
        .select(
            id_col,
            (
                F.round(
                    (
                        F.log2(F.coalesce(F.col("c1"), F.lit(0)) + vocab)
                        - F.log2(F.coalesce(F.col("c2"), F.lit(0)) + 1)
                    )
                    * 1e6
                ).cast("long")
            ).alias("nll"),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("nll").alias("nll_e6")
    )
    return (
        docs.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("nll_e6"), F.lit(0)).alias("nll_e6"),
            F.round(F.col("nll_e6") / F.col("n_bigrams"))
            .cast("long")
            .alias("xent_e6"),
        )
    )
