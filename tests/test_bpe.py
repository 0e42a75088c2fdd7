"""BPE tokenizer: training determinism, encode semantics, Spark operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecu_sbl_aace_datalake_spark.operators import bpe


class TestCore:
    def test_train_toy_corpus_hand_checked(self):
        # "abab" x10, "abc" x5: pair counts round 1: (a,b)=25, (b,a)=10,
        # (b,c)=5 -> merge (a,b). Round 2: (ab,ab)=10, (ab,c)=5 -> (ab,ab).
        merges = bpe.train_merges_from_counts(
            [("abab", 10), ("abc", 5)], num_merges=3
        )
        assert merges[:2] == [("a", "b"), ("ab", "ab")]

    def test_train_tie_breaks_lexicographically(self):
        # (a,b) and (c,d) both count 5 -> lexicographically smaller wins
        merges = bpe.train_merges_from_counts(
            [("ab", 5), ("cd", 5)], num_merges=1
        )
        assert merges == [("a", "b")]

    def test_train_stops_when_converged(self):
        merges = bpe.train_merges_from_counts([("ab", 1)], num_merges=50)
        assert merges == [("a", "b")]  # nothing left to merge after 1

    def test_encode_applies_rank_order_not_greedy(self):
        # merges: (b,c) rank 0, (a,b) rank 1. "abc": lowest-rank pair (b,c)
        # merges first -> [a, bc]; a greedy-leftmost encoder would give
        # [ab, c].
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert bpe.encode_word("abc", ranks) == ["a", "bc"]

    def test_encode_overlapping_pairs_left_to_right(self):
        ranks = {("a", "a"): 0}
        assert bpe.encode_word("aaa", ranks) == ["aa", "a"]
        assert bpe.encode_word("aaaa", ranks) == ["aa", "aa"]

    def test_encode_roundtrip_concat(self):
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_V1)}
        for w in ["customer", "window", "xyzzy", "a", "filtering"]:
            assert "".join(bpe.encode_word(w, ranks)) == w

    @given(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=8), min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=50, deadline=None)
    def test_encode_merge_all_equals_one_at_a_time(self, words):
        """The recursive-CTE oracle merges ONE leftmost occurrence per step;
        encode_word merges ALL occurrences of the chosen pair per step.
        Property: identical results under any trained table."""
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        merges = bpe.train_merges_from_counts(list(counts.items()), 6)
        ranks = {p: i for i, p in enumerate(merges)}

        def one_at_a_time(word):
            syms = list(word)
            while True:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, i)
                if best is None:
                    return syms
                i = best[1]
                syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]

        for w in words:
            assert bpe.encode_word(w, ranks) == one_at_a_time(w)


class TestSpark:
    def test_train_on_fixture_is_deterministic(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        m1 = bpe.bpe_train(docs, num_merges=30)
        m2 = bpe.bpe_train(docs, num_merges=30)
        assert m1 == m2 and len(m1) == 30

    def test_fixed_table_provenance(self, spark):
        """MERGES_DOCS_V1 == bpe_train(sf0.01 documents, num_merges=60)."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        assert bpe.bpe_train(docs, num_merges=60) == bpe.MERGES_DOCS_V1

    def test_token_counts_match_local_encode(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        got = {
            r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe.bpe_token_counts(docs, bpe.MERGES_DOCS_V1).collect()
        }
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_V1)}
        for r in docs.select("doc_id", "text").collect():
            words = [w for w in (r.text or "").split() if w]
            want = (
                len(words),
                sum(len(bpe.encode_word(w, ranks)) for w in words),
            )
            assert got[r.doc_id] == want

    def test_empty_and_null_text_count_zero(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "key value")], "doc_id long, text string"
        )
        rows = {
            r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe.bpe_token_counts(df, bpe.MERGES_DOCS_V1).collect()
        }
        assert rows[1] == (0, 0) and rows[2] == (0, 0)
        # key -> [k,e,y] (its merges rank past 60); value -> [v,alu,e]
        assert rows[3] == (2, 6)

    def test_bpe_encode_reassembles_in_order(self, spark):
        df = spark.createDataFrame(
            [(1, "customer dup window x")], "doc_id long, text string"
        )
        out = bpe.bpe_encode(df, bpe.MERGES_DOCS_V1).collect()[0].tokens
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_V1)}
        want = []
        for w in ["customer", "dup", "window", "x"]:
            want += bpe.encode_word(w, ranks)
        assert out == want

    def test_counts_feed_packing(self, spark, sf_dir):
        """chunk_pack consumes the BPE counts via token_col — packs cover
        all docs and respect the cumulative-boundary invariant."""
        from ecu_sbl_aace_datalake_spark.operators import packing
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        counted = bpe.bpe_token_counts(docs, bpe.MERGES_DOCS_V1).join(
            docs.select("doc_id", "source"), "doc_id"
        )
        packed = packing.chunk_pack(counted, budget=256)
        assert packed.count() == docs.count()
        # pack ids are non-decreasing in doc order within a shard
        rows = packed.orderBy("source", "doc_id").collect()
        last = {}
        for r in rows:
            assert last.get(r.source, -1) <= r.pack_id
            last[r.source] = r.pack_id


class TestByteLevel:
    def test_bytes_to_unicode_bijective_printable(self):
        b2u = bpe.bytes_to_unicode()
        assert len(b2u) == 256 and len(set(b2u.values())) == 256
        assert b2u[ord(" ")] == "Ġ" and b2u[ord("a")] == "a"
        # every mapped symbol is printable (no control chars survive)
        assert all(c.isprintable() for c in b2u.values())

    def test_map_word_bytes_fallback_no_oov(self):
        # any unicode string maps to base symbols — the no-OOV guarantee
        s = bpe.map_word_bytes(" héllo\n日")
        assert s.startswith("Ġ") and len(s) == len(" héllo\n日".encode())
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_BYTES_V1)}
        toks = bpe.encode_word(bpe.map_word_bytes("日本"), ranks)
        assert "".join(toks) == bpe.map_word_bytes("日本")

    def test_fixed_byte_table_provenance(self, spark):
        """MERGES_DOCS_BYTES_V1 == bpe_train(sf0.01 documents, 80 merges,
        byte_level=True)."""
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        got = bpe.bpe_train(docs, num_merges=80, byte_level=True)
        assert got == bpe.MERGES_DOCS_BYTES_V1

    def test_byte_level_counts_match_local_encode(self, spark, sf_dir):
        import re

        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        got = {
            r.doc_id: (r.n_words, r.n_tokens)
            for r in bpe.bpe_token_counts(
                docs, bpe.MERGES_DOCS_BYTES_V1, byte_level=True
            ).collect()
        }
        # Java \p{L} == python's re [^\W\d_] for this ascii fixture
        py_re = re.compile(
            r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"
        )
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_BYTES_V1)}
        for r in docs.select("doc_id", "text").limit(50).collect():
            pretoks = py_re.findall(r.text or "")
            want = (
                len(pretoks),
                sum(
                    len(bpe.encode_word(bpe.map_word_bytes(w), ranks))
                    for w in pretoks
                ),
            )
            assert got[r.doc_id] == want, (r.doc_id, got[r.doc_id], want)

    def test_byte_level_leading_space_convention(self, spark):
        df = spark.createDataFrame(
            [(1, "small table")], "doc_id long, text string"
        )
        toks = bpe.bpe_encode(
            df, bpe.MERGES_DOCS_BYTES_V1, byte_level=True
        ).collect()[0].tokens
        # 'small' (no leading space) stays s+mall; ' table' merges to Ġtable
        assert toks == ["s", "mall", "Ġtable"]

    def test_byte_level_counts_feed_packing(self, spark, sf_dir):
        from ecu_sbl_aace_datalake_spark.operators import packing
        from ecu_sbl_aace_datalake_spark.sources.io import load_table

        docs = load_table(spark, sf_dir, "documents")
        counted = bpe.bpe_token_counts(
            docs, bpe.MERGES_DOCS_BYTES_V1, byte_level=True
        ).join(docs.select("doc_id", "source"), "doc_id")
        packed = packing.chunk_pack(counted, budget=256)
        assert packed.count() == docs.count()
        rows = packed.orderBy("source", "doc_id").collect()
        last = {}
        for r in rows:
            assert last.get(r.source, -1) <= r.pack_id
            last[r.source] = r.pack_id


class TestPersistence:
    def test_merge_table_roundtrip(self, spark):
        import tempfile

        from ecu_sbl_aace_datalake_spark.sources.catalog import Lakehouse

        lh = Lakehouse("t", tempfile.mkdtemp())
        bpe.persist_merges(spark, lh, "bpe_merges", bpe.MERGES_DOCS_V1)
        back = bpe.load_merges(spark, lh, "bpe_merges")
        assert back == bpe.MERGES_DOCS_V1


class TestEncodeIds:
    def test_vocab_layout_and_roundtrip(self, spark):
        vocab = bpe.bpe_vocab_bytes(bpe.MERGES_DOCS_BYTES_V1)
        assert len(vocab) == 256 + len(bpe.MERGES_DOCS_BYTES_V1)
        assert vocab["a"] == ord("a") and vocab["Ġ"] == ord(" ")
        inv = {i: t for t, i in vocab.items()}
        df = spark.createDataFrame(
            [(1, "small table scan")], "doc_id long, text string"
        )
        rows = sorted(
            bpe.bpe_encode_ids(df, bpe.MERGES_DOCS_BYTES_V1).collect(),
            key=lambda r: r.pos,
        )
        assert [r.pos for r in rows] == list(range(len(rows)))
        # decoding the id sequence reproduces the byte-mapped text exactly
        decoded = "".join(inv[r.token_id] for r in rows)
        assert decoded == bpe.map_word_bytes("small table scan")

    def test_empty_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "key")], "doc_id long, text string"
        )
        got = bpe.bpe_encode_ids(df, bpe.MERGES_DOCS_BYTES_V1)
        assert {r.doc_id for r in got.collect()} == {3}
