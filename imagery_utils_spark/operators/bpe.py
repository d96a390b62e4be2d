"""BPE merge training — learning a subword vocabulary from the corpus
(Sennrich et al. 2016), the training side of functions/tok_encode's
encoder.

Scale shape: the corpus collapses ONCE into the word-frequency table
(groupBy word — map-side combinable; the vocab is orders of magnitude
smaller than the corpus and is the only thing iterations ever touch).
Each merge round is:

* **pair counts** — one JVM projection (zip-shifted symbol arrays)
  exploded to (a, b, wc) and a map-side-combinable sum over a key
  space bounded by the symbol-pair vocabulary;
* **best pair** — a deterministic TakeOrdered: count desc, then
  lexicographic (a, b) — ties can never flip across partitionings;
* **merge** — a pure projection. Words are carried as
  0x1F-separated symbol strings, and the merge is a left fold:
  ``acc ends_with(SEP + a) and x == b -> acc || x else acc || SEP || x``.
  The separator marks every symbol start, so the suffix test matches
  whole symbols only, and because a freshly merged symbol ``a||b``
  can never re-test equal to ``a`` (symbols are non-empty), the fold
  is exactly greedy leftmost non-overlapping — the BPE rule. The
  identical fold runs in SQL via list_reduce.

The best pair is driver-resident between rounds (like the k-means
centroids): a 3-tuple, shipped back into the next projection as
literals — no shuffle carries iteration state, no lineage growth
beyond one projection per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SEP", "init_symbols_col", "merge_col", "pair_counts",
           "learn_bpe"]

SEP = "\x1f"


def init_symbols_col(word) -> F.Column:
    """word -> SEP-prefixed per-char symbol string ('ab' -> '\\x1fa\\x1fb')."""
    return F.regexp_replace(word, "(.)", SEP + "$1")


def _sym_list(s) -> F.Column:
    return F.filter(F.split(s, SEP), lambda x: x != "")


def merge_col(s, a: str, b: str) -> F.Column:
    """Greedy-leftmost merge of the adjacent symbol pair (a, b)."""
    return F.aggregate(
        _sym_list(s), F.lit(""),
        lambda acc, x: F.when(
            acc.endswith(SEP + a) & (x == F.lit(b)),
            F.concat(acc, x)
        ).otherwise(F.concat(acc, F.lit(SEP), x)))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent symbol pairs weighted by word frequency.

    The symbol list is projected into a column once with a CASE
    short-word guard (r6, guide §1.2): the previous filter + slices
    re-evaluated the interpreted symbol split up to 4x per vocab row,
    once per merge round (same fix as lm.bigram_rows)."""
    return (vocab
            .select(F.col("wc"), _sym_list(F.col("s")).alias("_l"))
            .select(F.col("wc"), F.explode(F.expr(
                "case when size(_l) >= 2 then arrays_zip("
                "slice(_l, 1, size(_l) - 1), slice(_l, 2, size(_l) - 1)"
                ") else array() end")).alias("_p"))
            .groupBy(F.col("_p.0").alias("a"), F.col("_p.1").alias("b"))
            .agg(F.sum("wc").alias("cnt")))


def learn_bpe(words: DataFrame, n_merges: int):
    """words: (word, wc). Returns ([(a, b, cnt), ...], final vocab
    DataFrame with the merged symbol strings)."""
    # Materialize the word-frequency table once (r6, guide §1.2): every
    # merge round's pair_counts — and the caller's final corpus-state
    # consumer — would otherwise re-run the corpus tokenize+collapse
    # upstream of ``words`` (n_merges + 2 full corpus scans). The vocab
    # is corpus-collapsed (distinct words only), so this is the
    # iteration-state materialization the module docstring promises.
    vocab = words.select("word", "wc",
                         init_symbols_col(F.col("word")).alias("s")
                         ).localCheckpoint()
    merges = []
    for _ in range(n_merges):
        best = (pair_counts(vocab)
                .orderBy(F.desc("cnt"), "a", "b").limit(1).collect())
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((a, b, int(cnt)))
        vocab = vocab.select(
            "word", "wc", merge_col(F.col("s"), a, b).alias("s"))
    return merges, vocab
