"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side expressions with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny function-word list used by the n-gram/stopword language heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to"]


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                subword: bool = False,
                merges: str | None = None) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy (4-char chunks,
    ceil(len/4) per token — a standard fast token estimate).

    ``subword=True`` adds ``bpe_tokens``: the REAL deterministic
    byte-level BPE count (``operators.bpe``, merges table pinned by
    checksum) via one Arrow-batched pandas UDF in the same narrow
    projection — the count a training pipeline actually budgets in
    (whitespace under-counts subwords 1.3-1.5x on web text). The JVM
    columns stay in whole-stage codegen; zero shuffles either way.
    ``merges``: optional GPT-2-format ``vocab.bpe`` path for a real
    production vocabulary (``operators.bpe.get_tokenizer``); None = the
    hermetic self-trained table.
    """
    toks = _tokens(text_col)
    bpe_ish = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )
    cols = [
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("ws_tokens"),
        bpe_ish.alias("bpe_ish_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    ]
    if subword:
        from .bpe import bpe_tokens_col

        cols.insert(3, bpe_tokens_col(text_col, merges=merges)
                    .alias("bpe_tokens"))
    return df.select(*cols)


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: English function-word ratio over tokens.

    (The fixture corpus shares one vocabulary, so the value of this operator
    is its determinism and plan shape, not linguistic accuracy.)
    """
    toks = _tokens(text_col)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    ).cast("double")
    n = F.size(toks).cast("double")
    ratio = F.when(n > 0, F.round(stop_hits / n, 4)).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        ratio.alias("stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other"))
        .alias("lang_guess"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristics: length band, mean token length,
    stopword ratio → one score in [0, 1]."""
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    mean_tok_len = F.when(n > 0, F.round((n_chars - (n - 1)) / n, 4)) \
        .otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.isin(EN_STOPWORDS))).cast("double")
        / n,
    ).otherwise(F.lit(0.0))
    len_band = F.when((n >= 20) & (n <= 5000), F.lit(0.5)).otherwise(
        F.when(n > 0, F.lit(0.2)).otherwise(F.lit(0.0)))
    score = F.round(
        len_band + F.least(stop_ratio * 2, F.lit(0.3))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.2)
        .otherwise(0.0),
        4,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", prefix_len: int = 16) -> DataFrame:
    """Content fingerprint: md5 prefix (engine-portable; the rolling-hash
    use case — shard-stable content identity — only needs stability)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.md5(F.col(text_col)), 1, prefix_len)
        .alias("fingerprint"),
    )
