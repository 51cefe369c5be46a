"""Differential fuzz: random documents through every documents-based
query vs its DuckDB oracle.

The fixed testdata exercises one data shape; this harness generates a
deterministic-seed random corpus with the hostile cases web text actually
contains — unicode, embedded NULs, runs of spaces, empty texts, HTML
metacharacters (including ``</p>`` inside the text, which truncates the
parse on BOTH engines identically) — and asserts Spark == DuckDB for the
whole documents-based oracle surface, plus the full encode→decode
roundtrip gate over the same corpus.
"""

import random

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.test_driver_contract import normalize

_SEED = 20260816

#: documents-based oracle queries (everything that only reads `documents`)
DOC_QUERIES = [
    "parse_extract", "route_counts", "null_normalization", "topk_sources",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_clusters", "dedup_simhash_hamming", "lang_id", "quality_score",
    "token_count", "fingerprint", "contamination_check",
    "repetition_ratio", "corpus_curation", "pipeline_sinks",
    "codec_roundtrip",
]

_CHARS = (
    list("abcdefghij")
    + ["the", "a", "of", "and", "to"]          # stopwords (lang/quality)
    + ["é", "中", "𝛼", "x\x00y", "\x00", ""]    # unicode + NULs + empty
    + ["<p>", "</p>", "<html>", "&amp;"]       # parser metacharacters
    + ["word" * 8, "!!!", "123"]
)


def _random_text(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.06:
        return ""                              # null-coercion fixture
    n = rng.randint(1, 60)
    toks = [rng.choice(_CHARS) for _ in range(n)]
    # hostile whitespace: double spaces / leading / trailing
    sep = ["  " if rng.random() < 0.1 else " " for _ in range(n - 1)]
    body = toks[0] + "".join(s + t for s, t in zip(sep, toks[1:]))
    if rng.random() < 0.1:
        body = " " + body
    if rng.random() < 0.1:
        body = body + " "
    # planted duplicates so the dedup family has positives
    return body


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    rng = random.Random(_SEED)
    rows = []
    for i in range(150):
        rows.append({
            "doc_id": i,
            "text": _random_text(rng),
            "source": f"src{i % 7}",
            "lang": rng.choice(["en", "zh", "de", "fr", "es", "unknown"]),
        })
    for i in range(150, 170):                  # exact duplicate cluster
        rows.append({**rows[i % 10], "doc_id": i})
    pdf = pd.DataFrame(rows)
    pdf["n_chars"] = pdf["text"].str.len().astype("int64")
    out = tmp_path_factory.mktemp("fuzz")
    # single parquet FILE (the testdata layout both engines read directly)
    pdf.to_parquet(str(out / "documents.parquet"), index=False)
    # token_count's twin joins BPE counts from the content-keyed side
    # table; register this corpus so every oracle_sql() rebuild covers it
    entrymod._BPE_SIDE_EXTRA_DIRS.add(str(out))
    return str(out)


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_random_corpus_matches_oracle(name, spark, fuzz_dir):
    got = normalize(entrymod.queries()[name](spark, fuzz_dir).toPandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{fuzz_dir}/documents.parquet'")
    want = normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    # float columns get a 1e-9 relative tolerance (r3 verdict #9): the two
    # engines sum doubles in different orders, so a regenerated corpus
    # could legitimately differ in the last ulps of a sum/avg — that is
    # associativity, not a semantics bug. Integers/strings/bools stay
    # byte-exact (check_exact only relaxes float dtypes).
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-12,
                                  obj=name)
