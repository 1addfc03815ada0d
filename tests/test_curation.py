"""End-to-end corpus curation pipeline (pipelines/curation.py).

Each stage of ``curate_corpus`` is an operator with its own test file
(text/dedup/contamination); these tests pin the COMPOSITION — a planted
doc per drop-reason flows through the funnel exactly once — plus the plan
shape of the final stage.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from temporalscope_spark.pipelines.curation import curate_corpus

DOC_A = "the quick brown fox jumps over a lazy dog near the riverbank today"
DOCS = [
    # 1/2: a near-dup pair — only the min id survives clustering
    (1, DOC_A),
    (2, DOC_A + " indeed"),
    # 3: fails the quality gate (too few tokens, digit-heavy)
    (3, "1 2 3 4 5"),
    # 4: passes gate + clustering but shares a word 4-gram with the eval
    #    set -> decontaminated away
    (4, "pack my box with five dozen liquor jugs as the wizard quickly appears"),
]
EVAL = [
    (100, "they shipped five dozen liquor jugs across the wide sea yesterday evening"),
]


@pytest.mark.slow
def test_funnel_drops_each_planted_doc_for_its_reason(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    out = curate_corpus(train, ev, decontam_n=4)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    # doc 2 lost clustering to doc 1, doc 3 failed the gate, doc 4 is
    # contaminated; doc 1 survives with its whitespace token count
    assert got == {1: len(DOC_A.split())}


def test_clean_corpus_passes_through(spark):
    """With no dups and a disjoint eval set the funnel is the identity on
    (id, token count)."""
    rows = [
        (7, DOC_A),
        (8, "colorless green ideas sleep furiously beneath the calm surface of it all"),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "entirely unrelated benchmark prose with zero overlap whatsoever here now")],
        "doc_id long, text string",
    )
    out = curate_corpus(train, ev, decontam_n=4)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert got == {i: len(t.split()) for i, t in rows}


def test_eval_grams_join_is_broadcast(spark):
    """The decontamination stage must add no corpus-side shuffle: the eval
    n-gram set is broadcast into the train gram scan, and the final drop
    is a broadcast LEFT ANTI on the contaminated id set."""
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "doc_id long, text string")
    out = curate_corpus(train, ev, decontam_n=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
