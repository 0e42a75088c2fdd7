"""Property-based tests (hypothesis) for the pure driver-side functions —
the invariants golden examples can't exhaustively cover."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ecu_sbl_aace_datalake_spark.functions import cleaning
from ecu_sbl_aace_datalake_spark.operators import transform
from ecu_sbl_aace_datalake_spark.operators.query import (
    clean_string,
    escape_name,
    first_char_is_numeric,
    temp_table_name,
)

text = st.text(max_size=60)
# ASCII-only: Unicode case expansion ('ß'→'SS', 'ᾀ'→'ᾈ..') legitimately
# changes length in Python .upper(), same as the reference would
simple = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 '-",
    max_size=40,
)


class TestQueryHelperProperties:
    @given(text)
    def test_clean_string_only_word_chars(self, s):
        out = clean_string(s)
        assert all(c.isalnum() or c == "_" for c in out)
        # idempotent
        assert clean_string(out) == out

    @given(text)
    def test_escape_name_idempotent(self, s):
        assert escape_name(escape_name(s)) == escape_name(s)

    @given(text)
    def test_first_char_is_numeric_is_bool(self, s):
        assert isinstance(first_char_is_numeric(s), bool)

    @given(st.text(max_size=20))
    @settings(max_examples=30)
    def test_temp_table_name_valid_identifier(self, prefix):
        name = temp_table_name(prefix)
        assert name and not name[0].isdigit()
        assert all(c.isalnum() or c == "_" for c in name)


class TestCleaningProperties:
    @given(simple)
    def test_custom_initcap_idempotent(self, s):
        once = cleaning.custom_initcap(s)
        assert cleaning.custom_initcap(once) == once

    @given(simple)
    def test_custom_initcap_preserves_length_and_delims(self, s):
        out = cleaning.custom_initcap(s)
        if not s:
            # reference parity: falsy input → None (common.py:633)
            assert out is None
            return
        assert len(out) == len(s)
        for i, ch in enumerate(s):
            if ch in " '-`/":
                assert out[i] == ch

    @given(simple)
    def test_fix_up_name_no_parens_or_flip_commas(self, s):
        out = cleaning.fix_up_name(s)
        if out is not None:
            assert "(" not in out

    @given(st.one_of(st.none(), st.text(max_size=30), st.integers()))
    def test_fix_dodgy_total(self, v):
        out = cleaning.fix_dodgy_statuses(v)
        assert isinstance(out, str)  # total function over any input
        if v is None:
            assert out == "None Supplied"  # only None gets the sentinel
            # ('' stays '' — matching reference str().title() behavior)

    @given(st.text(max_size=30), st.text(max_size=30))
    def test_similarity_symmetric_ish(self, a, b):
        # difflib ratio is not strictly symmetric, but the predicate must
        # never crash and must be reflexive for non-empty strings
        cleaning.are_strings_similar(a, b)
        if a:
            assert cleaning.are_strings_similar(a, a)


class TestListHelperProperties:
    @given(st.lists(st.integers(), max_size=15), st.integers(), st.integers())
    def test_insert_never_mutates(self, lst, old, new):
        snapshot = list(lst)
        transform.insert_value_into_list(lst, old, new)
        assert lst == snapshot

    @given(st.lists(st.integers(), max_size=15), st.integers(), st.integers())
    def test_insert_postconditions(self, lst, old, new):
        out = transform.insert_value_into_list(lst, old, new)
        if new in lst:
            assert out == list(lst)          # no-op when already present
        else:
            assert new in out
            if old in lst:
                assert out[-1] == old        # old moved to the end
                assert out.index(new) == lst.index(old)  # new at old's slot

    @given(st.lists(st.integers(), max_size=15), st.integers(), st.integers())
    def test_replace_preserves_length(self, lst, old, new):
        out = transform.replace_value_in_list(lst, old, new)
        assert len(out) == len(lst)
        assert old not in out or old == new


class TestCodecProperties:
    """Round-trip invariants for the pure-Python image codecs: any image,
    any filter assignment, decode(encode(x)) == x (PNG/GIF are lossless)."""

    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.integers(0, 2**32 - 1),
        st.lists(st.sampled_from([0, 1, 2, 3, 4]), min_size=12, max_size=12),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_roundtrip_any_filters(self, h, w, seed, filters):
        import numpy as np

        from ecu_sbl_aace_datalake_spark.operators.multimodal import _decode_png_rgb
        from tests.test_dedup_similarity import TestPngDecode

        rng = np.random.RandomState(seed % (2**31))
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        out = _decode_png_rgb(TestPngDecode._png(img, filters=filters[:h]))
        assert np.array_equal(out, img)

    @given(st.integers(1, 10), st.integers(1, 10), st.integers(0, 2**31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_gif_roundtrip(self, h, w, seed):
        import numpy as np

        from ecu_sbl_aace_datalake_spark.operators.multimodal import _decode_gif_rgb
        from tests.test_dedup_similarity import TestGifDecode

        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
        idx = rng.randint(0, 4, (h, w)).astype(np.uint8)
        out = _decode_gif_rgb(TestGifDecode._gif(idx, pal))
        assert np.array_equal(out, pal[idx])

    @given(st.integers(0, 2**31 - 1))
    @settings(max_examples=15, deadline=None)
    def test_jpeg_solid_even_gray_exact(self, seed):
        import numpy as np

        from ecu_sbl_aace_datalake_spark.operators.multimodal import _decode_jpeg_rgb
        from tests.test_dedup_similarity import TestJpegDecode

        # even gray values decode exactly (DC-only block, integer quotient)
        g = (seed % 128) * 2
        img = np.full((8, 8), g, dtype=np.uint8)
        out = _decode_jpeg_rgb(TestJpegDecode._encode(img))
        assert out is not None and int(out[0, 0, 0]) == g


class TestDistributedOpInvariants:
    """Hypothesis invariants for the round-2 distributed operators —
    driven with small random frames (each example runs Spark jobs, so
    max_examples stays low; the invariants, not the volume, carry the
    value)."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 100_000), st.integers(0, 100)),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_islands_partition_rows_exactly(self, spark, rows):
        import datetime as dt

        from ecu_sbl_aace_datalake_spark.operators import timeseries as ts

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (f"k{k}", base + dt.timedelta(seconds=sec), float(v))
                for k, sec, v in rows
            ],
            "k string, ts timestamp, value double",
        )
        out = ts.islands(df, ["k"], max_gap_seconds=600).collect()
        # every input row lands in exactly one island
        assert sum(r["n_events"] for r in out) == len(rows)
        # islands of one key never overlap and are separated by > gap
        by_key = {}
        for r in out:
            by_key.setdefault(r["k"], []).append(r)
        for islands_ in by_key.values():
            islands_.sort(key=lambda r: r["island_start"])
            for a, b in zip(islands_, islands_[1:]):
                assert (b["island_start"] - a["island_end"]).total_seconds() > 600

    @given(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 1000), st.integers(0, 10**6)),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_latest_by_key_row_comes_from_input(self, spark, rows):
        import datetime as dt

        from ecu_sbl_aace_datalake_spark.operators import timeseries as ts

        base = dt.datetime(2024, 1, 1)
        data = [
            (f"k{k}", base + dt.timedelta(seconds=sec), i)
            for i, (k, sec, _) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "k string, ts timestamp, rid long")
        out = ts.latest_by_key(df, ["k"], tiebreak_col="rid").collect()
        in_rows = {(r[0], r[1], r[2]) for r in data}
        keys = {r[0] for r in data}
        assert len(out) == len(keys)  # exactly one per key
        for r in out:
            assert (r["k"], r["ts"], r["rid"]) in in_rows  # a REAL input row
            # it is the max (ts, rid) for its key
            best = max((t, i) for kk, t, i in data if kk == r["k"])
            assert (r["ts"], r["rid"]) == best

    @given(st.integers(0, 2**31 - 1), st.integers(1, 30))
    @settings(max_examples=10, deadline=None)
    def test_gumbel_resample_is_subset_of_k(self, spark, seed, k):
        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            gumbel_topk_resample,
        )

        df = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(50)], "doc_id long, w double"
        )
        out = gumbel_topk_resample(df, "w", k=k, seed=seed).collect()
        assert len(out) == min(k, 50)
        ids = [r["doc_id"] for r in out]
        assert len(set(ids)) == len(ids)  # without replacement
        assert all(0 <= i < 50 for i in ids)

    @given(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 10_000),
                      st.floats(-100, 100, allow_nan=False)),
            min_size=1, max_size=25,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_ewma_bounded_by_window_extremes(self, spark, rows):
        """EWMA is a convex combination of the frame's observed values —
        it must lie within [min, max] of each row's trailing window."""
        from ecu_sbl_aace_datalake_spark.operators import timeseries as ts

        data = [(k, t, v) for k, t, v in rows]
        df = spark.createDataFrame(data, "k long, ts long, v double")
        out = ts.ewma(df, "ts", "v", ["k"], alpha=0.4, window_n=5,
                      order_tiebreak=["v"]).collect()
        per_key = {}
        for k, t, v in data:
            per_key.setdefault(k, []).append((t, v))
        for r in out:
            series = sorted(per_key[r["k"]])
            idx = series.index((r["ts"], r["v"]))
            frame = [v for _, v in series[max(0, idx - 4): idx + 1]]
            assert min(frame) - 1e-4 <= r["ewma"] <= max(frame) + 1e-4  # 4dp rounding slack

    @given(st.integers(2, 16))
    @settings(max_examples=8, deadline=None)
    def test_pq_codes_partition_invariant(self, spark, parts):
        """pq_encode must produce identical codes regardless of input
        partitioning (pure per-row expression, no order dependence)."""
        from ecu_sbl_aace_datalake_spark.operators import similarity

        rows = [(i, [float((i * 7 + j * 3) % 13) - 6.0 for j in range(16)])
                for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cbs = similarity.pq_codebooks_fixed(df, m=4, k=8)
        a = sorted((r.vec_id, tuple(r.pq_code)) for r in
                   similarity.pq_encode(df, cbs).collect())
        b = sorted((r.vec_id, tuple(r.pq_code)) for r in
                   similarity.pq_encode(df.repartition(parts), cbs).collect())
        assert a == b


class TestJaroWinklerProperties:
    """The from-scratch JW scorer is pure python — hypothesis can sweep it
    against metric laws and DuckDB's builtin far beyond the goldens."""

    _s = st.text(alphabet="ab#1 xyz", max_size=14)

    @given(_s, _s)
    @settings(max_examples=200, deadline=None)
    def test_symmetric_and_bounded(self, a, b):
        from ecu_sbl_aace_datalake_spark.operators.dedup import _jaro_winkler_py

        x = _jaro_winkler_py(a, b)
        assert 0.0 <= x <= 1.0
        assert x == _jaro_winkler_py(b, a)

    @given(_s)
    @settings(max_examples=100, deadline=None)
    def test_identity_is_one(self, a):
        from ecu_sbl_aace_datalake_spark.operators.dedup import _jaro_winkler_py

        expected = 1.0 if a else 0.0  # empty-string edge matches DuckDB
        assert _jaro_winkler_py(a, a) == expected

    @given(_s, _s)
    @settings(max_examples=200, deadline=None)
    def test_duckdb_parity(self, a, b):
        import duckdb

        from ecu_sbl_aace_datalake_spark.operators.dedup import _jaro_winkler_py

        d = duckdb.connect().execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert round(_jaro_winkler_py(a, b), 9) == round(d, 9)
