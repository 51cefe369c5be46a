"""Deterministic byte-level BPE (operators/bpe.py).

The merges table is trained at import from a fixed corpus; the checksum
test pins it so ANY drift (corpus edit, tie-break change, pre-tokenizer
change) fails here rather than silently changing every downstream token
count. Byte-level base alphabet ⇒ lossless on arbitrary unicode — the
hypothesis roundtrip is the strongest single property a tokenizer has.
"""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from compress_otel_collector_spark.operators import bpe


class TestMergesTable:
    def test_pinned_checksum_and_size(self):
        assert bpe.vocab_size() == 512
        assert len(bpe.MERGES) == 256
        assert hashlib.sha256(
            repr(bpe.MERGES).encode()).hexdigest()[:16] == "d2034baf627279a5"

    def test_first_merges_are_english_glue(self):
        # ' t', 'he', ' t'+'he' = ' the' — the most frequent English units;
        # also a readability check that training ran over the right corpus
        assert bpe.MERGES[0] == (32, 116)
        assert bpe.MERGES[1] == (104, 101)
        assert bpe.MERGES[2] == (256, 257)

    def test_retrain_is_deterministic(self):
        assert tuple(bpe._train_merges(bpe._TRAIN_CORPUS, bpe.N_MERGES)) \
            == bpe.MERGES


class TestEncode:
    def test_golden_ids(self):
        assert bpe.bpe_encode("the quick brown fox") == \
            [297, 390, 423, 484, 460, 370]
        assert bpe.bpe_encode("tokenization works") == \
            [316, 337, 421, 272, 105, 294, 319, 107, 115]
        assert bpe.bpe_count("https://www.example.com/path?id=99") == 19

    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_lossless_roundtrip(self, s):
        assert bpe.bpe_decode(bpe.bpe_encode(s)) == s

    @given(st.text(alphabet=st.characters(min_codepoint=32,
                                          max_codepoint=127), max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_count_bounds(self, s):
        n = bpe.bpe_count(s)
        assert n == len(bpe.bpe_encode(s))
        assert n <= len(s.encode("utf-8"))          # merges only shrink
        if s.strip():
            assert n >= len(bpe._PRETOK.findall(s)) > 0

    def test_cache_consistency(self):
        # the lru_cache must be a pure memo: cold and warm agree
        s = "the tokenizer caches pre-tokens across calls"
        warm = bpe.bpe_encode(s)
        bpe._DEFAULT_TOK._encode_pretoken.cache_clear()
        assert bpe.bpe_encode(s) == warm

    def test_empty_and_whitespace(self):
        assert bpe.bpe_encode("") == []
        assert bpe.bpe_count("") == 0
        assert bpe.bpe_decode(bpe.bpe_encode("  \t\n ")) == "  \t\n "


@pytest.mark.usefixtures("spark")
class TestSparkCounts:
    def test_counts_match_scalar_and_partition_invariant(self, spark):
        rows = [(i, t) for i, t in enumerate([
            "the quick brown fox", "tokenization works", "",
            "https://www.example.com/path?id=99",
            "café ☃ unicode", None, "the the the the"])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe.bpe_token_counts(df).collect()}
        exp = {i: (bpe.bpe_count(t) if t else 0) for i, t in rows}
        assert got == exp
        got7 = {r["doc_id"]: r["bpe_tokens"]
                for r in bpe.bpe_token_counts(df.repartition(7)).collect()}
        assert got7 == exp

    def test_plan_is_narrow(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = bpe.bpe_token_counts(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # map-only: no shuffle at any scale

    def test_token_stats_subword_column_and_plan(self, spark):
        """token_stats(subword=True): real BPE rides the same narrow
        projection as the JVM columns — one ArrowEvalPython, zero
        shuffles — and the values match the scalar kernel."""
        from compress_otel_collector_spark.operators.textstats import (
            token_stats)
        rows = [(1, "the quick brown fox"), (2, ""), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = token_stats(df, subword=True)
        assert out.columns == ["doc_id", "ws_tokens", "bpe_ish_tokens",
                               "bpe_tokens", "n_chars"]
        got = {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}
        assert got == {1: bpe.bpe_count("the quick brown fox"), 2: 0, 3: 0}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("ArrowEvalPython") == 1


FIXTURE = "tests/fixtures/mini_vocab.bpe"


class TestMergesFile:
    """GPT-2 ``vocab.bpe`` text-format loading (r6 verdict #3): the
    checked-in fixture is a hand-written PUBLIC-FORMAT file (visible-
    unicode alphabet, ``#version`` header) exercising Ġ (space byte),
    Ċ (newline byte) and multi-level symbol composition; golden ids were
    hand-derived from the merge ranks and pin parser + kernel together."""

    def test_alphabet_known_points(self):
        v = bpe._bytes_to_unicode()
        assert len(v) == 256 and len(set(v.values())) == 256
        assert v[0x20] == "Ġ"   # Ġ = space
        assert v[0x0A] == "Ċ"   # Ċ = newline
        assert v[ord("A")] == "A"    # printable bytes map to themselves

    def test_fixture_golden_ids(self):
        tok = bpe.BPETokenizer.from_merges_file(FIXTURE)
        assert tok.vocab_size() == 271  # 256 bytes + 15 merges
        s = "the word and the words\n\nin order"
        ids = tok.encode(s)
        # hand-derived: "the"→t+he (he merges first, classic BPE order
        # artifact), " word"→266, " and"→269, " the"→260, " words"→266+s,
        # interior newlines pre-tokenize singly (GPT-2 \s+(?!\S) rule),
        # "in"→261, " order"→Ġ+or+d+er
        assert ids == [116, 256, 266, 269, 260, 266, 115, 10, 10,
                       261, 32, 264, 100, 262]
        assert tok.decode(ids) == s
        assert tok.count(s) == len(ids)
        # trailing double newline DOES hit the ĊĊ merge (id 270)
        assert tok.encode("x\n\n") == [120, 270]

    def test_file_loaded_lossless_roundtrip(self):
        tok = bpe.get_tokenizer(FIXTURE)
        assert tok is bpe.get_tokenizer(FIXTURE)  # per-path cache

        @settings(max_examples=150, deadline=None)
        @given(st.text(max_size=40))
        def prop(s):
            assert tok.decode(tok.encode(s)) == s
        prop()

    def test_malformed_files_fail_loudly(self):
        with pytest.raises(ValueError, match="neither a base byte"):
            bpe.BPETokenizer(bpe.parse_merges_text("Ġth e\n"))
        with pytest.raises(ValueError, match="expected 'sym1 sym2'"):
            bpe.parse_merges_text("a b c\n")
        with pytest.raises(ValueError, match="expected 'sym1 sym2'"):
            bpe.parse_merges_text("lonely\n")

    def test_duplicate_merge_lines_are_skipped_consistently(self):
        """A duplicate merged symbol keeps the FIRST rank and the line is
        dropped entirely (r8, ADVICE r7): pre-r8 the duplicate was still
        appended to merges, so _rank mapped the pair to the LAST rank
        while later lines composing the symbol resolved to the first id —
        those merges could never fire."""
        visible = bpe._bytes_to_unicode()
        a, b = visible[ord("a")], visible[ord("b")]
        text = f"{a} {b}\n{a} {b}\n{a}{b} {b}\n"
        merges = bpe.parse_merges_text(text)
        # duplicate dropped: ranks stay dense and consistent
        assert merges == [(ord("a"), ord("b")), (256, ord("b"))]
        tok = bpe.BPETokenizer(merges)
        # the second merge now FIRES: 'abb' -> [ab, b] -> [abb]
        assert tok.encode("abb") == [257]

    def test_default_unchanged_by_knob(self):
        # threading merges=None everywhere must keep the pinned table
        assert bpe.get_tokenizer(None) is bpe._DEFAULT_TOK
        assert bpe.bpe_count("the fox") == bpe._DEFAULT_TOK.count("the fox")

    def test_parse_inverts_serialization_property(self):
        """parse_merges_text must invert the vocab.bpe serialization for
        ANY valid merge table, not just the fixture: serialize random
        well-formed tables (each pair over base bytes or earlier merge
        results — the format's invariant) through the published visible
        alphabet and require the parsed integer pairs to match exactly.
        """
        visible = bpe._bytes_to_unicode()

        def sym(ids, tok_id):
            # token id → visible-alphabet symbol string
            return "".join(visible[b] for b in ids[tok_id])

        @settings(max_examples=100, deadline=None)
        @given(st.data())
        def prop(data):
            n = data.draw(st.integers(min_value=0, max_value=12))
            ids = {i: bytes([i]) for i in range(256)}
            merges = []
            for k in range(n):
                a = data.draw(st.sampled_from(sorted(ids)), label=f"a{k}")
                b = data.draw(st.sampled_from(sorted(ids)), label=f"b{k}")
                merged = ids[a] + ids[b]
                # duplicate-producing lines keep the FIRST rank; skip
                # rather than model that here (covered by the fixture)
                if any(v == merged for v in ids.values()):
                    continue
                merges.append((a, b))
                ids[256 + len(merges) - 1] = merged
            text = "#version: 0.2\n" + "".join(
                f"{sym(ids, a)} {sym(ids, b)}\n" for a, b in merges)
            assert bpe.parse_merges_text(text) == merges
        prop()


class TestMergesKnobSpark:
    def test_counts_and_packing_use_the_file_vocab(self, spark):
        rows = [(1, "the word and the words"), (2, "the quick brown fox"),
                (3, ""), (4, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        ftok = bpe.get_tokenizer(FIXTURE)
        got = {r["doc_id"]: r["bpe_tokens"]
               for r in bpe.bpe_token_counts(df, merges=FIXTURE).collect()}
        assert got == {i: (ftok.count(t) if t else 0) for i, t in rows}
        # and differs from the default table on this text (real knob)
        dflt = {r["doc_id"]: r["bpe_tokens"]
                for r in bpe.bpe_token_counts(df).collect()}
        assert dflt != got
        from compress_otel_collector_spark.operators.curation import (
            pack_sequences)
        packed = {r["doc_id"]: r["n_tokens"] for r in pack_sequences(
            df, seq_len=8, n_shards=2, tokenizer="bpe",
            merges=FIXTURE).collect()}
        assert packed == {i: ftok.count(t) for i, t in rows if t}
        from compress_otel_collector_spark.operators.textstats import (
            token_stats)
        ts = {r["doc_id"]: r["bpe_tokens"] for r in token_stats(
            df, subword=True, merges=FIXTURE).collect()}
        assert ts == got
