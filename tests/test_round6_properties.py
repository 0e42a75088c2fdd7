"""Hypothesis properties for the round-6 operators: byte-level BPE
roundtrip/no-OOV, cap_per_group invariants, shuffle_corpus permutation.
Pure-python properties run many examples; Spark-backed ones run few
(one job per example)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from ecu_sbl_aace_datalake_spark.operators import bpe, transform


class TestByteBpeProperties:
    @given(st.text(min_size=0, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_map_word_bytes_roundtrip_and_printable(self, w):
        """byte mapping is a bijection on utf-8 byte strings: length equals
        the byte length, every symbol is printable, and the inverse map
        recovers the original bytes exactly."""
        m = bpe.map_word_bytes(w)
        raw = w.encode("utf-8")
        assert len(m) == len(raw)
        inv = {c: b for b, c in bpe.bytes_to_unicode().items()}
        assert bytes(inv[c] for c in m) == raw

    @given(st.text(min_size=1, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_encode_never_oov_and_concats_back(self, w):
        """Under the frozen byte-level table: every token is in the GPT-2
        vocab layout (so ids always exist — the no-OOV guarantee), and the
        token concatenation reproduces the mapped word exactly."""
        ranks = {p: i for i, p in enumerate(bpe.MERGES_DOCS_BYTES_V1)}
        vocab = bpe.bpe_vocab_bytes(bpe.MERGES_DOCS_BYTES_V1)
        mapped = bpe.map_word_bytes(w)
        toks = bpe.encode_word(mapped, ranks)
        assert "".join(toks) == mapped
        assert all(t in vocab for t in toks)

    @given(
        st.lists(st.text(alphabet="abĠ", min_size=1, max_size=6), min_size=1,
                 max_size=8)
    )
    @settings(max_examples=100, deadline=None)
    def test_training_monotone_prefix(self, words):
        """Training with k merges yields a prefix of training with k+1 —
        the merge loop is greedy and deterministic, so budgets only extend,
        never reorder."""
        counts: dict[str, int] = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        m3 = bpe.train_merges_from_counts(list(counts.items()), 3)
        m5 = bpe.train_merges_from_counts(list(counts.items()), 5)
        assert m5[: len(m3)] == m3


class TestCapPerGroupProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
            min_size=1, max_size=40, unique_by=lambda t: t[0],
        ),
        st.integers(1, 6),
    )
    @settings(max_examples=10, deadline=None)
    def test_cap_subset_and_expected_selection(self, spark, rows, cap):
        # session-scoped fixture: allowed alongside @given
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        kept = {
            r.doc_id
            for r in transform.cap_per_group(df, "source", cap, "doc_id").collect()
        }
        # replicate the md5 selection locally: top-cap per group
        def pri(i):
            return int(hashlib.md5(f"cap{i}".encode()).hexdigest()[:15], 16)

        by_group: dict[str, list[int]] = {}
        for i, g in rows:
            by_group.setdefault(g, []).append(i)
        want = set()
        for g, ids in by_group.items():
            want |= set(sorted(ids, key=lambda i: (pri(i), i))[:cap])
        assert kept == want


class TestShuffleProperties:
    @given(
        st.sets(st.integers(0, 10_000), min_size=1, max_size=60),
        st.sampled_from(["s1", "epoch2"]),
    )
    @settings(max_examples=8, deadline=None)
    def test_positions_match_local_md5_order(self, spark, ids, salt):
        df = spark.createDataFrame([(i,) for i in sorted(ids)], ["doc_id"])
        got = {
            r.doc_id: r.shuffle_pos
            for r in transform.shuffle_corpus(df, "doc_id", salt=salt).collect()
        }

        def pri(i):
            return int(
                hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16
            )

        want = {
            i: pos
            for pos, i in enumerate(sorted(ids, key=lambda i: (pri(i), i)))
        }
        assert got == want
