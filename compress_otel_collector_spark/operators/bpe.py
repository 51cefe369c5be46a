"""Deterministic byte-level BPE tokenization (r5 verdict #5).

Whitespace token counts mis-budget packing and per-source caps on real
web text by 1.3-1.5x; a training-data pipeline budgets in subword
tokens. This module is a self-contained byte-level BPE in the GPT-2
style (Sennrich et al. 2016 merges; byte-level base alphabet so ANY
unicode string round-trips losslessly): 256 base byte tokens + a fixed
merges table, greedy lowest-rank merge encoding, and an ASCII variant of
the published GPT-2 pre-tokenizer regex.

The DEFAULT merges table is trained AT IMPORT from the fixed corpus
below — fully deterministic (most-frequent pair per step, ties broken by
byte-lexicographic pair order), no external data, ~milliseconds — and
its content is pinned by checksum in ``tests/test_bpe.py`` so any
accidental drift (corpus edit, tie-break change, regex change) fails the
fast suite, not a downstream count.

Production token budgets need a REAL vocabulary (~50k merges): pass a
``merges=`` path to :func:`get_tokenizer` (and through
``token_stats(subword=True, merges=...)`` /
``pack_sequences(tokenizer="bpe", merges=...)``) pointing at a standard
GPT-2-format ``vocab.bpe`` text file — ``#version`` header then one
space-separated symbol pair per line, symbols in the published
byte-to-visible-unicode alphabet (the format of openai/gpt-2's released
encoder and every HuggingFace byte-level BPE). The file is parsed into
the same integer-pair kernel the self-trained table uses, so goldens pin
one kernel for both. Worker-side resolution goes through the module-level
:func:`get_tokenizer` cache keyed by path — only the PATH string enters
UDF closures (on a real cluster ship the file with ``spark-submit
--files`` and pass the basename). Deliberate deviation, documented: the
pre-tokenizer stays the ASCII variant below (Python ``re`` lacks
``\\p{L}``), so counts over non-ASCII letter runs can differ from a
tokenizer using the unicode-category regex; identical on ASCII text.

Scale shape: encoding is a pure narrow map (``mapInPandas``, zero
shuffles). The per-pre-token LRU cache is the standard trick that makes
BPE cheap on web text: natural-language pre-token vocabulary is tiny
relative to the corpus, so almost every pre-token hits the cache.

No reference analog (the reference tokenizes nothing); this is a
training-data-pipeline operator per the build brief.
"""

from __future__ import annotations

import collections
import re
from functools import lru_cache

from pyspark.sql import DataFrame

#: ASCII variant of the GPT-2 pre-tokenizer pattern (contractions, then
#: space-prefixed letter / digit / punctuation runs, then whitespace).
#: Python ``re`` lacks \p{L}; [A-Za-z] is the deterministic ASCII stand-in.
_PRETOK = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)|\s+")

#: Fixed training corpus: generic English + the url/number/punctuation
#: shapes web text is made of. Editing this changes the merges table and
#: therefore every BPE count — the checksum test pins it on purpose.
_TRAIN_CORPUS = """
the quick brown fox jumps over the lazy dog and the dog sleeps in the
sun while the fox runs through the forest to find food for the winter
this is a test of the tokenizer that should learn common english words
and word pieces like ing ed er es tion ally the and that with from for
https://www.example.com/path/to/page?id=1234&lang=en is a typical url
crawled at 2024-01-15T12:00:00Z with status 200 and content type text
the model trains on sequences of 2048 tokens packed from documents that
were deduplicated filtered scored and redacted before packing them into
training shards one shard per hash bucket with a fixed sequence length
when in the course of human events it becomes necessary for one people
to dissolve the political bands which have connected them with another
we hold these truths to be self evident that all are created equal and
it was the best of times it was the worst of times it was the age of
wisdom it was the age of foolishness it was the epoch of belief it was
the season of light it was the season of darkness the spring of hope
"""

#: number of merges to learn; vocab = 256 bytes + N_MERGES subwords
N_MERGES = 256


def _train_merges(corpus: str, n_merges: int) -> list[tuple[int, int]]:
    """Standard BPE training over the pre-tokenized word-frequency dict.

    Deterministic: the winning pair each step is (max frequency, then
    smallest (a, b) tuple); merged symbol ids are assigned 256, 257, ...
    in merge order.
    """
    words = collections.Counter(_PRETOK.findall(corpus))
    seqs: dict[str, tuple[int, ...]] = {
        w: tuple(w.encode("utf-8")) for w in words}
    merges: list[tuple[int, int]] = []
    for step in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, f in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        new_id = 256 + step
        merges.append(best)
        a, b = best
        for w, s in seqs.items():
            if len(s) < 2:
                continue
            out = []
            i = 0
            n = len(s)
            while i < n:
                if i < n - 1 and s[i] == a and s[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _bytes_to_unicode() -> dict[int, str]:
    """The published GPT-2 byte→visible-unicode alphabet (printable bytes
    map to themselves; the rest to U+0100.. in order) used by every
    ``vocab.bpe``-format merges file. Public algorithm (openai/gpt-2
    encoder, MIT; reproduced from the spec, not copied)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAC + 1)) + list(range(0xAE, 0xFF + 1)))
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def parse_merges_text(text: str) -> list[tuple[int, int]]:
    """GPT-2 ``vocab.bpe`` text → integer merge pairs for the kernel.

    Each line after the optional ``#version`` header is ``sym1 sym2`` in
    the visible-unicode alphabet; symbols must be single base characters
    or concatenations produced by EARLIER lines (raises otherwise — a
    malformed or truncated vocab fails loudly, not with wrong counts).
    Returned pairs are over integer token ids: 0-255 = raw bytes,
    256+rank = merge results, exactly the self-trained table's space.
    """
    visible_of_byte = _bytes_to_unicode()
    sym_id: dict[str, int] = {
        ch: b for b, ch in visible_of_byte.items()}
    merges: list[tuple[int, int]] = []
    for lineno, line in enumerate(text.splitlines(), 1):
        line = line.rstrip("\n")
        if not line or line.startswith("#version"):
            continue
        parts = line.split(" ")
        if len(parts) != 2 or not parts[0] or not parts[1]:
            raise ValueError(
                f"merges line {lineno}: expected 'sym1 sym2', got {line!r}")
        ids = []
        for sym in parts:
            i = sym_id.get(sym)
            if i is None:
                raise ValueError(
                    f"merges line {lineno}: symbol {sym!r} is neither a "
                    "base byte char nor a previous merge result")
            ids.append(i)
        merged = parts[0] + parts[1]
        if merged in sym_id:
            # duplicate merged symbol: keep the FIRST rank and skip the
            # line entirely. Appending anyway (pre-r8) left rank/sym_id
            # inconsistent: the encoder emitted the LAST duplicate's id
            # (dict-comprehension _rank) while later lines composing the
            # merged symbol resolved to the first id, so those merges
            # could never fire (ADVICE r7).
            continue
        sym_id[merged] = 256 + len(merges)
        merges.append((ids[0], ids[1]))
    return merges


class BPETokenizer:
    """One merges table + its greedy encoder (per-instance LRU cache).

    ``merges`` are integer pairs over the byte-level id space; rank =
    position (training/file order IS merge priority, the BPE contract).
    """

    def __init__(self, merges, name: str = "custom"):
        self.merges: tuple[tuple[int, int], ...] = tuple(
            (int(a), int(b)) for a, b in merges)
        self.name = name
        self._rank: dict[tuple[int, int], int] = {
            p: i for i, p in enumerate(self.merges)}
        id_bytes: list[bytes] = [bytes([i]) for i in range(256)]
        for a, b in self.merges:
            id_bytes.append(id_bytes[a] + id_bytes[b])
        self._id_bytes = id_bytes
        self._encode_pretoken = lru_cache(maxsize=1 << 17)(
            self._encode_pretoken_uncached)

    @classmethod
    def from_merges_file(cls, path: str) -> "BPETokenizer":
        with open(path, encoding="utf-8") as f:
            return cls(parse_merges_text(f.read()), name=path)

    def vocab_size(self) -> int:
        return len(self._id_bytes)

    def _encode_pretoken_uncached(self, bs: bytes) -> tuple[int, ...]:
        """Greedy BPE over one pre-token: repeatedly merge every
        occurrence of the lowest-rank adjacent pair until none applies."""
        s = list(bs)
        rank = self._rank
        while len(s) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(s) - 1):
                r = rank.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_pair = (s[i], s[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            new_id = 256 + best_rank
            out = []
            i = 0
            n = len(s)
            while i < n:
                if i < n - 1 and s[i] == a and s[i + 1] == b:
                    out.append(new_id)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return tuple(s)

    def encode(self, text: str) -> list[int]:
        """Token ids for ``text``; lossless (``decode`` inverts it)."""
        out: list[int] = []
        for tok in _PRETOK.findall(text):
            out.extend(self._encode_pretoken(tok.encode("utf-8")))
        return out

    def decode(self, ids) -> str:
        return b"".join(self._id_bytes[i] for i in ids).decode("utf-8")

    def count(self, text: str) -> int:
        """Token count without materializing the id list."""
        n = 0
        for tok in _PRETOK.findall(text):
            n += len(self._encode_pretoken(tok.encode("utf-8")))
        return n


_DEFAULT_TOK = BPETokenizer(
    _train_merges(_TRAIN_CORPUS, N_MERGES), name="self-trained")

#: the hermetic default table (checksum-pinned by tests/test_bpe.py)
MERGES: tuple[tuple[int, int], ...] = _DEFAULT_TOK.merges


@lru_cache(maxsize=8)
def _tokenizer_from_file(path: str) -> BPETokenizer:
    return BPETokenizer.from_merges_file(path)


def get_tokenizer(merges: str | None = None) -> BPETokenizer:
    """The tokenizer for a ``merges=`` knob value: None → the hermetic
    self-trained default; a path → that GPT-2-format ``vocab.bpe`` file,
    cached per path (this is what worker-side UDF closures call, so the
    file parses once per executor, not per batch)."""
    if merges is None:
        return _DEFAULT_TOK
    return _tokenizer_from_file(merges)


def vocab_size() -> int:
    return _DEFAULT_TOK.vocab_size()


def bpe_encode(text: str) -> list[int]:
    """Token ids for ``text`` under the default table; lossless."""
    return _DEFAULT_TOK.encode(text)


def bpe_decode(ids) -> str:
    return _DEFAULT_TOK.decode(ids)


def bpe_count(text: str, merges: str | None = None) -> int:
    """Token count without materializing the id list."""
    return get_tokenizer(merges).count(text)


def bpe_tokens_col(text_col: str = "text", merges: str | None = None):
    """Scalar Arrow-batched pandas-UDF column: BPE token count per row.

    Composes with JVM projections (the surrounding expressions stay in
    whole-stage codegen; Spark inserts one ArrowEvalPython for this
    column) and stays narrow — zero shuffles at any scale. NULL → 0.
    ``merges``: optional ``vocab.bpe`` path — only the path string is
    captured; each worker resolves it via the :func:`get_tokenizer`
    cache (ship the file with ``spark-submit --files`` on a cluster).
    """
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf

    def _count(s: pd.Series) -> pd.Series:
        tok = get_tokenizer(merges)
        return s.map(lambda t: tok.count(t) if isinstance(t, str) else 0)

    _count.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_count, "long")(col(text_col))


def bpe_token_counts(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     merges: str | None = None) -> DataFrame:
    """Per-document BPE token counts: ``(doc_id, bpe_tokens)``.

    Pure narrow ``mapInPandas`` — zero shuffles, no driver state; the
    pre-token LRU cache amortizes the merge loop across a batch (web
    text re-uses a small pre-token vocabulary). 100 TB shape: a map-only
    stage that scales with executors linearly. ``merges`` as in
    :func:`bpe_tokens_col`.
    """
    def fn(it):
        import pandas as pd

        tok = get_tokenizer(merges)
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "bpe_tokens": [tok.count(t) if isinstance(t, str) else 0
                               for t in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(
        fn, "doc_id long, bpe_tokens long")
