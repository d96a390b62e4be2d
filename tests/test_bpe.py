"""BPE merge-training tests — fold semantics, hand-checked learning,
partition invariance."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from imagery_utils_spark.operators.bpe import (
    SEP, init_symbols_col, learn_bpe, merge_col, pair_counts)


def _merge_one(spark, word, a, b):
    df = spark.createDataFrame([Row(w=word)])
    s = init_symbols_col(F.col("w"))
    return df.select(merge_col(s, a, b).alias("m")).collect()[0].m


def test_merge_fold_greedy_leftmost(spark):
    assert _merge_one(spark, "abab", "a", "b") == f"{SEP}ab{SEP}ab"
    # overlapping runs: greedy leftmost pairs, the tail single survives
    assert _merge_one(spark, "aaa", "a", "a") == f"{SEP}aa{SEP}a"
    assert _merge_one(spark, "aaaa", "a", "a") == f"{SEP}aa{SEP}aa"
    # no false suffix match: symbol 'xa' does not end-with-symbol 'a'
    assert _merge_one(spark, "xab", "a", "b") == f"{SEP}x{SEP}ab"


def test_learn_bpe_hand_corpus(spark):
    """'low'x5 + 'lower'x2 + 'newest'x6: first merge must be (e, s)
    wait — classic Sennrich example: es/est dominate via 'newest'."""
    rows = ([Row(word="low", wc=5), Row(word="lower", wc=2),
             Row(word="newest", wc=6), Row(word="widest", wc=3)])
    words = spark.createDataFrame(rows)
    merges, vocab = learn_bpe(words, 3)
    # pair (e,s) appears in newest(6)+widest(3)=9 — the max; then
    # (es,t) 9; then (l,o) 7
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 9
    assert merges[1][:2] == ("es", "t") and merges[1][2] == 9
    assert merges[2][:2] == ("l", "o") and merges[2][2] == 7
    got = {r.word: r.s for r in vocab.collect()}
    assert got["newest"] == f"{SEP}n{SEP}e{SEP}w{SEP}est"
    assert got["low"] == f"{SEP}lo{SEP}w"


def test_learn_bpe_partition_invariant(spark):
    rows = [Row(word=f"w{i}abc", wc=i + 1) for i in range(50)]
    w1 = spark.createDataFrame(rows)
    w2 = spark.createDataFrame(rows).repartition(17)
    m1, _ = learn_bpe(w1, 4)
    m2, _ = learn_bpe(w2, 4)
    assert m1 == m2


def test_pair_counts_weighted(spark):
    words = spark.createDataFrame([Row(word="ab", wc=7),
                                   Row(word="ba", wc=2),
                                   Row(word="x", wc=9)])
    vocab = words.select("word", "wc",
                         init_symbols_col(F.col("word")).alias("s"))
    got = {(r.a, r.b): r.cnt for r in pair_counts(vocab).collect()}
    assert got == {("a", "b"): 7, ("b", "a"): 2}
