"""Golden tests for the cleaning functions — exact semantics the reference
encodes (SURVEY.md §2.9, reference common.py:554-724), per FIXTURES.md:
'SMITH, JOHN'→'John Smith'; "o'brien"→"O'Brien"; de/of lower-cased;
mixed-case McDonald preserved; 'n/a'→garbage; fuzzy snap at 0.6."""

from __future__ import annotations

from ecu_sbl_aace_datalake_spark.functions import cleaning


class TestCustomInitcap:
    def test_basic(self):
        assert cleaning.custom_initcap("hello world") == "Hello World"

    def test_apostrophe_delimiter(self):
        assert cleaning.custom_initcap("o'brien") == "O'Brien"

    def test_hyphen_delimiter(self):
        assert cleaning.custom_initcap("smith-jones") == "Smith-Jones"

    def test_mixed_case_preserved(self):
        assert cleaning.custom_initcap("McDonald") == "McDonald"

    def test_particles_lowercased(self):
        assert cleaning.custom_initcap("jan DE vries") == "Jan de Vries"
        assert cleaning.custom_initcap("duke OF york") == "Duke of York"

    def test_all_upper_normalized(self):
        assert cleaning.custom_initcap("SMITH") == "Smith"

    def test_none_safe(self):
        assert cleaning.custom_initcap(None) is None

    def test_falsy_is_none(self):
        # reference common.py:633 `if not name: return None` — empty string
        # and zero normalize to None, not ''
        assert cleaning.custom_initcap("") is None
        assert cleaning.custom_initcap(0) is None

    def test_non_str_coerced(self):
        # reference common.py:635-636 str()-coerces non-str input
        assert cleaning.custom_initcap(42) == "42"
        assert cleaning.custom_initcap(3.5) == "3.5"

    def test_compound(self):
        assert cleaning.custom_initcap("o'brien-de la MAR") == "O'Brien-de La Mar"

    def test_slash_delimiter(self):
        # reference common.py:638 delimiter set includes '/' and '`'
        assert cleaning.custom_initcap("smith/jones") == "Smith/Jones"

    def test_backtick_delimiter(self):
        assert cleaning.custom_initcap("o`brien") == "O`Brien"

    def test_double_quote_not_a_delimiter(self):
        # '"' is NOT in the reference delimiter set: '"smith"' is one token,
        # no cased chars before s → capitalize() leaves it '"smith"'
        assert cleaning.custom_initcap('"smith"') == '"smith"'

    def test_mixed_case_beats_particle(self):
        # reference capitalize_parts checks mixed-case BEFORE the particle
        # rule: "De" (mixed) survives; "DE"/"de" (unmixed) lower to "de"
        assert cleaning.custom_initcap("De la cruz") == "De La Cruz"
        assert cleaning.custom_initcap("DE la cruz") == "de La Cruz"


class TestFixUpName:
    def test_last_first_flip(self):
        assert cleaning.fix_up_name("SMITH, JOHN") == "John Smith"

    def test_paren_truncation(self):
        assert cleaning.fix_up_name("smith, john (deceased)") == "John Smith"

    def test_bare_comma_is_none(self):
        assert cleaning.fix_up_name(",") is None
        assert cleaning.fix_up_name(" , ") is None

    def test_falsy_returned_as_is(self):
        # reference common.py:674 `if not name: return name` — the falsy
        # value itself comes back, NOT normalized to None
        assert cleaning.fix_up_name("") == ""
        assert cleaning.fix_up_name(None) is None

    def test_whitespace_only_becomes_empty(self):
        # '   ' is truthy, not ',' → initcap keeps spaces, paren-split
        # strips them → '' (reference returns '', not None)
        assert cleaning.fix_up_name("   ") == ""

    def test_multi_comma_reverses_all_parts(self):
        # reference reverses EVERY comma part (common.py:682-684), not a
        # single Last/First flip
        assert cleaning.fix_up_name("a, b, c") == "C B A"

    def test_non_str_coerced(self):
        assert cleaning.fix_up_name(42) == "42"

    def test_plain_name(self):
        assert cleaning.fix_up_name("jane doe") == "Jane Doe"


class TestGarbage:
    def test_na_variants(self):
        assert cleaning.garbage_clo("n/a") is True
        assert cleaning.garbage_clo("N/A") is True
        assert cleaning.garbage_clo("  n/a  ") is True

    def test_falsy(self):
        assert cleaning.garbage_clo(None) is True
        assert cleaning.garbage_clo("") is True

    def test_non_str(self):
        assert cleaning.garbage_clo(42) is True

    def test_clean_value(self):
        assert cleaning.garbage_clo("BUILDING") is False


class TestFixDodgy:
    def test_exact(self):
        assert cleaning.fix_dodgy_statuses("Completed") == "Completed"

    def test_title_coercion(self):
        assert cleaning.fix_dodgy_statuses("completed") == "Completed"

    def test_fuzzy_snap(self):
        assert cleaning.fix_dodgy_statuses("Complted") == "Completed"
        assert cleaning.fix_dodgy_statuses("Discontinue") == "Discontinued"

    def test_none_supplied(self):
        assert cleaning.fix_dodgy_statuses(None) == "None Supplied"

    def test_no_snap_below_threshold(self):
        assert cleaning.fix_dodgy_statuses("Zzzz") == "Zzzz"

    def test_assess_level(self):
        assert cleaning.fix_dodgy_assess_level("consolidated") == "Consolidated"
        assert cleaning.fix_dodgy_assess_level("Demonstratd") == "Demonstrated"

    def test_similarity_threshold(self):
        assert cleaning.are_strings_similar("Completed", "Complted")
        assert not cleaning.are_strings_similar("Completed", "Xyz")


class TestVectorizedUdfs:
    def test_udf_matches_plain(self, spark):
        import pyspark.sql.functions as F

        names = ["SMITH, JOHN", "o'brien", "McDonald", None, "jan DE vries (x)"]
        df = spark.createDataFrame([(n,) for n in names], "name string")
        rows = df.select(
            cleaning.custom_initcap_udf(F.col("name")).alias("ic"),
            cleaning.fix_up_name_udf(F.col("name")).alias("fx"),
            cleaning.garbage_clo_udf(F.col("name")).alias("gb"),
        ).collect()
        for n, r in zip(names, rows):
            assert r.ic == cleaning.custom_initcap(n) if n is not None else r.ic is None
            assert r.fx == cleaning.fix_up_name(n) if n is not None else r.fx is None
            assert r.gb == cleaning.garbage_clo(n)

    def test_native_garbage_matches_plain(self, spark):
        import pyspark.sql.functions as F

        vals = ["n/a", "N/A ", "", None, "ok", " N/a"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        rows = df.select(cleaning.garbage_clo_col("v").alias("g")).collect()
        for v, r in zip(vals, rows):
            assert r.g == cleaning.garbage_clo(v), v


class TestReferenceParityRound2:
    def test_fix_dodgy_falsy_inputs(self):
        # reference common.py:575 `if not value` — '' and 0 are falsy too
        assert cleaning.fix_dodgy_thing("", ["Completed"]) == "None Supplied"
        assert cleaning.fix_dodgy_thing(0, ["Completed"]) == "None Supplied"
        assert cleaning.fix_dodgy_thing(None, ["Completed"]) == "None Supplied"

    def test_escape_name_any_backtick_passthrough(self):
        from ecu_sbl_aace_datalake_spark.operators.query import escape_name

        # reference common.py:134: ANY backtick → untouched (never re-wrap)
        assert escape_name("my `col") == "my `col"
        assert escape_name("`quoted`") == "`quoted`"
        assert escape_name("has space") == "`has space`"
        assert escape_name("a.b-c") == "a.`b-c`"

    def test_temp_table_name_prefix_normalization(self):
        from ecu_sbl_aace_datalake_spark.operators.query import temp_table_name

        # underscore-only / non-str prefixes → 'tmp' (common.py:147-153)
        assert temp_table_name("___").startswith("tmp_")
        assert temp_table_name(123).startswith("tmp_")
        assert temp_table_name("abc__").startswith("abc_")
        assert not temp_table_name("9lives")[0].isdigit()

    def test_df_shape_compat_returns_reference_dict(self, spark):
        import pyspark.sql.functions as F

        from ecu_sbl_aace_datalake_spark import compat

        df = spark.range(5).withColumn("x", F.lit(1))
        out = compat.dfShape(df)
        assert out == {"shape": (5, 2), "columns": ["id", "x"]}


class TestNormalizeUnicode:
    def test_forms_and_nulls(self, spark):
        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            normalize_unicode,
        )

        df = spark.createDataFrame(
            [(1, "café"), (2, "café"), (3, None), (4, "ﬁne")],
            "id long, text string",
        )
        nfc = {r.id: r.text_norm for r in normalize_unicode(df).collect()}
        assert nfc[1] == nfc[2] == "café"
        assert nfc[3] is None
        assert nfc[4] == "ﬁne"  # NFC keeps compatibility chars
        nfkc = {
            r.id: r.text_norm
            for r in normalize_unicode(df, form="NFKC").collect()
        }
        assert nfkc[4] == "fine"  # NFKC folds the fi ligature

    def test_bad_form_raises(self, spark):
        import pytest

        from ecu_sbl_aace_datalake_spark.operators.textstats import (
            normalize_unicode,
        )

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError, match="normalization form"):
            normalize_unicode(df, form="NFX")
