"""Decontamination (operators/decontam.py): gram generation and overlap
flags vs hand-built expectations."""
from pyspark.sql import functions as F

from imagery_utils_spark.operators.decontam import (
    contamination_flags, token_ngrams)


def test_token_ngrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x  y"), (3, "short")],
        "doc_id long, text string")
    got = sorted((r.doc_id, r.gram)
                 for r in token_ngrams(df, 3).collect())
    assert got == [(1, "a b c"), (1, "b c d")]
    got2 = sorted((r.doc_id, r.gram)
                  for r in token_ngrams(df, 2).collect())
    assert (2, "x y") in got2  # double space collapses


def test_contamination_flags(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "zz the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different text with no overlap whatsoever here ok"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "xx the quick brown fox jumps over the lazy dog tonight yy")],
        "bid long, text string")
    got = {r.doc_id: (r.n_contam_grams, r.contaminated)
           for r in contamination_flags(docs, bench, n=10).collect()}
    # docs 1+2 each contain the bench 10-gram "the quick ... tonight";
    # doc 3 shares nothing
    assert got[1][1] and got[2][1] and not got[3][1]
    assert got[1][0] >= 1 and got[2][0] >= 1 and got[3][0] == 0


def test_plan_broadcasts_bench(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))],
        "doc_id long, text string")
    plan = contamination_flags(docs, docs, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
