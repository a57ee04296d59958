"""Vectorized tokenizer UDFs (pandas/Arrow — no per-row Python in the hot path).

Implements the analyzer-chain spec (see textnorm.py) over pandas Series using
C-backed `.str` operations: split → normalize → stopword mask → re-split →
length filter → prefix truncation → ordered dedup. The per-row Python loop is
avoided by exploding to a flat token frame and using vectorized masks +
`drop_duplicates`; only the rare >255-char-token chunking touches Python rows.

Parity with `textnorm.analyze` is enforced by tests/test_tokenize_udf.py
(including Hypothesis property tests over adversarial Unicode).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..stopwords import ALL
from ..textnorm import (
    JAVA_WS_RE,
    MAX_NGRAM,
    MAX_TOKEN_LEN,
    MIN_NGRAM,
    _JAVA_TRIM,
    uniform_string,
)

_WS_PAT = JAVA_WS_RE.pattern
_COMBINING_PAT = "[\u0300-\u036f]"
_NONWORD_PAT = r"[^a-zA-Z0-9_\-]"


def _uniform_vec(s: pd.Series) -> pd.Series:
    """Vectorized Tools.uniformString (trim → lower → NFD → strip combining
    U+0300-036F → non-[a-z0-9_-] → space). ASCII inputs skip the NFD +
    combining-strip passes (identity on ASCII) — a big win on mostly-ASCII
    corpora without changing semantics."""
    lowered = s.str.strip(_JAVA_TRIM).str.lower()
    nonascii = lowered.str.contains("[^\x00-\x7f]", regex=True, na=False)
    if nonascii.any():
        slow = (
            lowered[nonascii]
            .str.normalize("NFD")
            .str.replace(_COMBINING_PAT, "", regex=True)
        )
        lowered = pd.concat([lowered[~nonascii], slow]).sort_index(kind="stable")
    return lowered.str.replace(_NONWORD_PAT, " ", regex=True)


def _token_frame(texts: pd.Series) -> pd.DataFrame:
    """Vectorized pre-dedup analyzer stream: Series[str] -> flat (row, tok)
    frame in stream order (steps 1-5 of the chain; callers add dedup or
    frequency counting on top). `row` is the input Series index."""
    # 1) whitespace tokenize (Java isWhitespace class); frame keeps (row, order)
    toks = texts.str.split(_WS_PAT, regex=True).explode().dropna()
    toks = toks[toks.str.len() > 0]
    frame = pd.DataFrame({"row": toks.index.to_numpy(), "tok": toks.to_numpy()})
    if len(frame):
        # 1b) Lucene buffer flush: chunk >255-char tokens, preserving order
        longmask = frame["tok"].str.len() > MAX_TOKEN_LEN
        if longmask.any():
            frame.loc[longmask, "tok"] = frame.loc[longmask, "tok"].map(
                lambda w: [w[i : i + MAX_TOKEN_LEN] for i in range(0, len(w), MAX_TOKEN_LEN)]
            )
            frame = frame.explode("tok", ignore_index=True)
        # 2) UniformFilter on each token
        frame["tok"] = _uniform_vec(frame["tok"])
        # 3) StopFilter on the WHOLE uniformized token (may contain spaces)
        frame = frame[~frame["tok"].isin(ALL)]
        # 4) WhitespaceFilter: java-trim then re-split on " +"
        frame = frame.assign(tok=frame["tok"].str.strip(_JAVA_TRIM).str.split(" +", regex=True))
        frame = frame.explode("tok", ignore_index=True)
        # 5) NGramFilter: len >= 3 → prefix of min(6, len)
        frame = frame[frame["tok"].str.len() >= MIN_NGRAM]
        frame = frame.assign(tok=frame["tok"].str.slice(0, MAX_NGRAM))
    return frame


def _tokenize_series(texts: pd.Series, pre_uniform: bool, max_tokens: int | None) -> pd.Series:
    """Core vectorized pipeline: Series[str] -> Series[list[str]]."""
    texts = texts.fillna("")
    if pre_uniform:
        texts = _uniform_vec(texts)
    frame = _token_frame(texts)
    if len(frame):
        # 6) per-row ordered dedup (+ optional cap)
        frame = frame.drop_duplicates(["row", "tok"], keep="first")
        if max_tokens is not None:
            frame = frame.groupby("row", sort=False).head(max_tokens)
    grouped = frame.groupby("row", sort=False)["tok"].agg(list)
    out = pd.Series([[]] * len(texts), index=texts.index, dtype=object)
    out.loc[grouped.index] = grouped
    return out


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize(texts: pd.Series) -> pd.Series:
    """Index-path tokenizer: ordered distinct prefix tokens of a document."""
    return _tokenize_series(texts, pre_uniform=False, max_tokens=None)


@pandas_udf(T.ArrayType(T.StringType()))
def rerank_tokens(texts: pd.Series) -> pd.Series:
    """Rerank-path tokenizer: pre-uniformized, capped at 100 distinct tokens
    (getCommonNGrams semantics — SimDocsSearch.scala:509-528)."""
    return _tokenize_series(texts, pre_uniform=True, max_tokens=100)


_BOTH_RET = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("rr_tokens", T.ArrayType(T.StringType())),
    ]
)


@pandas_udf(_BOTH_RET)
def tokenize_with_rerank(texts: pd.Series, rerank_source: pd.Series) -> pd.DataFrame:
    """Fused index-path + rerank-path tokenizer: ONE Python eval node per doc
    row instead of two (same kernels as `tokenize`/`rerank_tokens`; the build
    path pays the JVM↔Python crossing once — guide §4.1)."""
    return pd.DataFrame(
        {
            "tokens": _tokenize_series(texts, pre_uniform=False, max_tokens=None),
            "rr_tokens": _tokenize_series(rerank_source, pre_uniform=True, max_tokens=100),
        }
    )


@pandas_udf(T.StringType())
def uniform(texts: pd.Series) -> pd.Series:
    """Vectorized Tools.uniformString equivalent."""
    return _uniform_vec(texts.fillna(""))


def with_tokens(df, text_col: str = "text", out_col: str = "tokens"):
    """Attach index-path tokens to a DataFrame column."""
    return df.withColumn(out_col, tokenize(F.col(text_col)))
