"""C4 cleaning battery (operators/c4.py) — every rule exercised by a
hand-built page whose expected outcome is explicit."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.c4 import c4_clean

PAGES = [
    # 0: healthy page — 5 terminal-punctuated lines survive
    (0, "one two three.\nfour five six!\nseven eight nine?\n"
        'ten eleven twelve."\nthirteen fourteen fifteen.'),
    # 1: line rules — no terminal punct / too short / javascript term
    (1, "no terminal punctuation here\nshort.\n"
        "enable javascript to view.\nthis line is kept fine."),
    # 2: lorem ipsum page
    (2, "Lorem Ipsum dolor sit amet.\nmore text follows here."),
    # 3: brace page (code)
    (3, "function foo() { return 1; }\nreal sentence here."),
    # 4: bad-word page
    (4, "this page mentions badword sadly.\nclean line here too."),
    # 5: empty page
    (5, ""),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(PAGES, ["doc_id", "text"])
    rows = c4_clean(
        df,
        "text",
        "doc_id",
        min_line_words=3,
        min_sentences=5,
        line_drop_terms=("javascript",),
        page_drop_terms=("badword",),
    ).collect()
    return {r["doc_id"]: r for r in rows}


class TestC4Clean:
    def test_healthy_page_survives(self, out):
        r = out[0]
        assert r["n_lines"] == 5 and r["n_kept_lines"] == 5
        assert r["n_sentences"] == 5
        assert not any(
            r[f] for f in (
                "flag_bad_term", "flag_lorem_ipsum", "flag_brace",
                "flag_too_few_sentences",
            )
        )
        assert r["c4_keep"] is True
        assert r["clean_text"].count("\n") == 4

    def test_line_rules(self, out):
        r = out[1]
        # only "this line is kept fine." survives: no-punct, <3 words,
        # and the javascript line are all dropped
        assert r["n_kept_lines"] == 1
        assert r["clean_text"] == "this line is kept fine."
        assert r["flag_too_few_sentences"] and r["c4_keep"] is False

    def test_lorem_ipsum_flag(self, out):
        assert out[2]["flag_lorem_ipsum"] is True
        assert out[2]["c4_keep"] is False

    def test_brace_flag(self, out):
        assert out[3]["flag_brace"] is True
        assert out[3]["c4_keep"] is False

    def test_bad_term_flag(self, out):
        r = out[4]
        assert r["flag_bad_term"] is True
        assert r["c4_keep"] is False
        # the flag is page-level: the clean lines themselves survive
        assert r["n_kept_lines"] == 2

    def test_empty_page(self, out):
        r = out[5]
        assert r["n_kept_lines"] == 0 and r["clean_text"] == ""
        assert r["c4_keep"] is False

    def test_terminal_punct_counts_sentences(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c. d e f. end of line.")], ["doc_id", "text"]
        )
        r = c4_clean(df, min_sentences=0).first()
        # one kept line containing three terminal marks = 3 sentences
        assert r["n_kept_lines"] == 1 and r["n_sentences"] == 3

    def test_validation(self, spark):
        df = spark.createDataFrame([(0, "x.")], ["doc_id", "text"])
        with pytest.raises(DataFrameValidationError):
            c4_clean(df, sep="")
        with pytest.raises(DataFrameValidationError):
            c4_clean(df, min_line_words=0)
        with pytest.raises(DataFrameValidationError):
            c4_clean(df, line_drop_terms=("Upper",))


class TestNormalizeUnicode:
    def _one(self, spark, s, **kw):
        from temporalscope_spark.operators.text import normalize_unicode

        df = spark.createDataFrame([(1, s)], "id long, text string")
        return normalize_unicode(df, "text", **kw).collect()[0]

    def test_smart_quotes_and_dashes(self, spark):
        r = self._one(spark, "“Hi” — it’s fine – ok")
        assert r["clean_text"] == '"Hi" - it\'s fine - ok'
        assert r["changed"] is True

    def test_strip_zero_width_controls_softhyphen(self, spark):
        r = self._one(spark, "a​b‌c﻿d­e\x07f\x1fg")
        assert r["clean_text"] == "abcdefg"

    def test_ellipsis_and_spaces(self, spark):
        r = self._one(spark, "wait… no way　really")
        assert r["clean_text"] == "wait... no way really"

    def test_collapse_flag(self, spark):
        r = self._one(spark, "a  \t b", collapse_whitespace=False)
        assert r["clean_text"] == "a  \t b"
        assert r["changed"] is False
        r2 = self._one(spark, "  a  \t b ")
        assert r2["clean_text"] == "a b"

    def test_null_and_clean_text_unchanged(self, spark):
        from temporalscope_spark.operators.text import normalize_unicode

        df = spark.createDataFrame([(1, None), (2, "plain ascii")],
                                   "id long, text string")
        out = {r["id"]: r for r in normalize_unicode(df, "text").collect()}
        assert out[1]["clean_text"] is None and out[1]["changed"] is False
        assert out[2]["clean_text"] == "plain ascii"
        assert out[2]["changed"] is False

    def test_errors(self, spark):
        import pytest as _pt

        from temporalscope_spark.exceptions import DataFrameValidationError
        from temporalscope_spark.operators.text import normalize_unicode

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with _pt.raises(DataFrameValidationError):
            normalize_unicode(df, "nope")


class TestLexicalDiversity:
    def _run(self, spark, rows):
        from temporalscope_spark.operators.text import lexical_diversity

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in lexical_diversity(df).collect()}

    def test_counts_and_ratios(self, spark):
        out = self._run(spark, [(1, "the cat and the dog and the bird")])
        r = out[1]
        # counts: the=3, and=2, cat/dog/bird=1
        assert r["n_words"] == 8 and r["n_types"] == 5 and r["n_hapax"] == 3
        assert r["ttr"] == pytest.approx(5 / 8)
        assert r["hapax_ratio"] == pytest.approx(3 / 5)
        # K = 1e4 * (9 + 4 + 1 + 1 + 1 - 8) / 64
        assert r["yule_k"] == pytest.approx(10000 * 8 / 64)

    def test_all_distinct_and_all_same(self, spark):
        out = self._run(spark, [(1, "a b c d"), (2, "x x x x")])
        assert out[1]["ttr"] == 1.0 and out[1]["yule_k"] == 0.0
        assert out[2]["n_types"] == 1 and out[2]["n_hapax"] == 0
        assert out[2]["yule_k"] == pytest.approx(10000 * (16 - 4) / 16)

    def test_empty_and_null(self, spark):
        out = self._run(spark, [(1, ""), (2, None), (3, "   ")])
        for i in (1, 2, 3):
            r = out[i]
            assert r["n_words"] == 0 and r["ttr"] == 0.0 and r["yule_k"] == 0.0

    def test_case_and_whitespace_normalized(self, spark):
        out = self._run(spark, [(1, "The  THE\tthe")])
        assert out[1]["n_types"] == 1 and out[1]["n_words"] == 3
