"""Mojibake repair (operators/text.py) vs a pure-Python replace chain;
idempotence on repaired text; NULL propagation. All non-ASCII text is
spelled with explicit ``\\uXXXX`` escapes so the fixture is
editor/encoding-proof (several sequences contain C1 controls and NBSP)."""

import pytest

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.text import MOJIBAKE_MAP, fix_mojibake

# mojibake building blocks (UTF-8 bytes decoded once as cp1252)
E_ACUTE_BAD = "\u00c3\u00a9"            # -> e-acute
LDQ_BAD = "\u00e2\u20ac\u0153"          # -> left double quote
RDQ_BAD = "\u00e2\u20ac\u009d"          # -> right double quote (C1 tail)
RSQ_BAD = "\u00e2\u20ac\u2122"          # -> right single quote
ENDASH_BAD = "\u00e2\u20ac\u201c"       # -> en dash
ELLIPSIS_BAD = "\u00e2\u20ac\u00a6"     # -> ellipsis
NBSP_BAD = "\u00c2\u00a0"               # -> no-break space
NTILDE_BAD = "\u00c3\u00b1"             # -> n-tilde
UUML_BAD = "\u00c3\u00bc"               # -> u-umlaut
CCEDIL_BAD = "\u00c3\u00a7"             # -> c-cedilla

DOCS = [
    (1, f"caf{E_ACUTE_BAD} au lait"),
    (2, f"{LDQ_BAD}quoted{RDQ_BAD}"),
    (3, f"it{RSQ_BAD}s fine {ENDASH_BAD} really"),
    (4, "plain ascii, no corruption"),
    (5, f"se{NTILDE_BAD}or {UUML_BAD}ber gar{CCEDIL_BAD}on"),
    (6, f"ellipsis{ELLIPSIS_BAD} and{NBSP_BAD}nbsp"),
    (7, ""),
    (8, None),
]


def _ref(text):
    if text is None:
        return None
    for bad, good in MOJIBAKE_MAP:
        text = text.replace(bad, good)
    return text


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_matches_python_replace_chain(spark):
    got = {r["doc_id"]: (r["fixed_text"], r["changed"])
           for r in fix_mojibake(_df(spark)).collect()}
    for doc_id, text in DOCS:
        want = _ref(text)
        assert got[doc_id][0] == want, doc_id
        if text is not None:
            assert got[doc_id][1] == (want != text), doc_id


def test_specific_repairs(spark):
    got = {r["doc_id"]: r["fixed_text"] for r in fix_mojibake(_df(spark)).collect()}
    assert got[1] == "caf\u00e9 au lait"
    assert got[2] == "\u201cquoted\u201d"
    assert got[3] == "it\u2019s fine \u2013 really"
    assert got[5] == "se\u00f1or \u00fcber gar\u00e7on"
    assert got[6] == "ellipsis\u2026 and\u00a0nbsp"
    assert got[8] is None


def test_idempotent_on_repaired_text(spark):
    once = fix_mojibake(_df(spark)).select(
        "doc_id", "fixed_text"
    ).withColumnRenamed("fixed_text", "text")
    twice = {r["doc_id"]: (r["fixed_text"], r["changed"])
             for r in fix_mojibake(once).collect()}
    for doc_id, text in DOCS:
        want = _ref(text)
        assert twice[doc_id][0] == want
        if text is not None:
            assert twice[doc_id][1] is False  # nothing left to repair


def test_map_is_longest_first(spark):
    # three-char punctuation misreads contain the two-char prefixes, so
    # the replace chain must apply longest sequences first
    lens = [len(b) for b, _ in MOJIBAKE_MAP]
    assert lens == sorted(lens, reverse=True)


def test_missing_column_raises(spark):
    with pytest.raises(DataFrameValidationError):
        fix_mojibake(_df(spark), text_col="nope")
