"""Python UDTF surface: lateral table functions (SURVEY §2.2 UDF/UDAF/UDTF).

The rest of the engine deliberately stays on built-in expressions and
Arrow-batched pandas UDFs (the fast paths); this module covers the third
user-function shape — a table function usable in a SQL ``LATERAL`` join —
with a token-frequency emitter over the documents table. Tokenization stays
in lockstep with ``textstats._tokens`` / the DuckDB oracle (empty tokens
dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_token_freq_udtf(spark: SparkSession) -> None:
    """Register ``token_freq(text)`` — yields (token, freq) rows per doc."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, freq bigint")
    class TokenFreq:
        def eval(self, text: str):
            if not text:
                return
            from collections import Counter

            counts = Counter(t for t in text.split(" ") if t)
            for tok, n in sorted(counts.items()):
                yield tok, n

    spark.udtf.register("token_freq", TokenFreq)


def token_frequencies(spark: SparkSession, docs: DataFrame,
                      max_doc_id: int = 50) -> DataFrame:
    """(doc_id, token, freq) via the UDTF in a LATERAL join."""
    register_token_freq_udtf(spark)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(f"""
        SELECT doc_id, t.token, t.freq
        FROM _udtf_docs, LATERAL token_freq(text) t
        WHERE doc_id < {int(max_doc_id)}
    """)
