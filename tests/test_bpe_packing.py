"""pack_sequences(tokenizer="bpe") — the subword-budgeted packing path.

Two pins:
  1. bit-identical vs a pure-Python reference packer fed scalar
     ``bpe_count`` values (shard = first-32-bits-of-md5(doc_id) % n,
     per-shard cumsum in doc_id order) on the real sf0.001 documents;
  2. the count source is the ONLY difference from the whitespace path —
     feeding the ws tokenizer a synthetic text with exactly bpe_count
     whitespace tokens reproduces the bpe packing rows verbatim.
"""

import hashlib

from compress_otel_collector_spark.operators.bpe import bpe_count
from compress_otel_collector_spark.operators.curation import pack_sequences

SF = "/root/testdata/sf0.001"


def _shard(doc_id: int, n_shards: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) \
        % n_shards


def _reference_pack(counts: dict[int, int], seq_len: int, n_shards: int):
    """Driver-side reference packer over {doc_id: n_tokens}."""
    rows = []
    cum = [0] * n_shards
    for doc_id in sorted(counts):
        nt = counts[doc_id]
        if nt < 1:
            continue
        s = _shard(doc_id, n_shards)
        before = cum[s]
        rows.append((doc_id, s, nt, before // seq_len, before % seq_len,
                     (before + nt - 1) // seq_len))
        cum[s] = before + nt
    return sorted(rows)


class TestBpePacking:
    def test_matches_python_reference_on_real_docs(self, spark):
        df = spark.read.parquet(f"{SF}/documents.parquet")
        got = sorted(tuple(r) for r in pack_sequences(
            df, seq_len=512, n_shards=8, tokenizer="bpe").collect())
        docs = {r["doc_id"]: r["text"]
                for r in df.select("doc_id", "text").collect()}
        exp = _reference_pack(
            {i: bpe_count(t or "") for i, t in docs.items()}, 512, 8)
        assert len(got) > 100
        assert got == exp

    def test_ws_path_with_equal_counts_is_identical(self, spark):
        """ws ≡ bpe given equal counts: rebuild each doc as exactly
        bpe_count(text) whitespace tokens and run the ws path — the
        packing rows must match verbatim (shard/window/packing plan is
        count-source independent)."""
        df = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
        docs = {r["doc_id"]: r["text"]
                for r in df.select("doc_id", "text").collect()}
        bpe_rows = sorted(tuple(r) for r in pack_sequences(
            df, seq_len=256, n_shards=4, tokenizer="bpe").collect())
        synth = spark.createDataFrame(
            [(i, " ".join(["w"] * bpe_count(t or "")))
             for i, t in docs.items()],
            "doc_id long, text string")
        ws_rows = sorted(tuple(r) for r in pack_sequences(
            synth, seq_len=256, n_shards=4, tokenizer="ws").collect())
        assert bpe_rows == ws_rows

    def test_bpe_inflation_band_on_web_text(self, spark):
        """Sanity: subword counts exceed whitespace counts on real web
        text (the whole point of the operator) but stay under the byte
        count (merges only shrink)."""
        df = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
        docs = [r["text"] for r in df.select("text").collect() if r["text"]]
        ws = sum(len(t.split()) for t in docs)
        bpe = sum(bpe_count(t) for t in docs)
        nbytes = sum(len(t.encode("utf-8")) for t in docs)
        assert ws < bpe <= nbytes

    def test_unknown_tokenizer_raises(self, spark):
        import pytest
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="unknown tokenizer"):
            pack_sequences(df, tokenizer="wordpiece")
