"""Bigram language-model quality gate with integer-quantized log-probs.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) gates web documents on the
perplexity of a language model trained on a CLEAN reference corpus;
DCLM and RedPajama-v2 carry the same signal. This operator trains
add-one-smoothed bigram counts on a reference DataFrame and scores
every document's surprisal against them:

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)        (Laplace smoothing)
    bits     = floor_log2(c(w1) + V) - floor_log2(c(w1,w2) + 1)

Quantization contract: ``floor_log2`` is the exact integer bit-length
(``length(bin(x)) - 1``) — no libm. Why: corpus-summed float log-probs
depend on accumulation order (non-associative), so the same job on two
cluster sizes could hash differently; integer bits make every partial
sum exact and order-independent, which is what lets the north rule's
N-vs-4N runs (and the DuckDB oracle, via ``printf('%b')``) agree
bit-for-bit. Quantization error is < 1 bit per bigram and preserves
the gate's ordering signal; smoothing makes unseen bigrams maximally
surprising (~log2 V bits) instead of the unsmoothed-ML artifact where
singletons score zero.

Scale shape: one explode per side for bigram generation; the count
tables are vocabulary-bounded (<< corpus) and join back on (w1, w2) /
(w1) — hash joins fed by map-side partial aggregation; V is ONE
broadcast singleton; the final per-doc rollup is one doc_id shuffle.
Zipf-head contexts are heavy keys only on the tiny count side; the
occurrence-side join is AQE skew-split territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imagery_utils_spark.functions.text import tokens_col

__all__ = ["bigram_rows", "lm_bits_score"]


def _floorlog2(c) -> F.Column:
    """floor(log2(x)) for positive integers — bit-length minus one."""
    return F.length(F.bin(c)) - 1


def bigram_rows(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2) — consecutive lowercased whitespace tokens.

    Shape (r6, guide §1.2): the token array is projected into a column
    ONCE and the short-doc guard is a ``CASE`` on that column — the
    previous ``.filter(size(toks) >= 2)`` + two ``slice(toks, ...)``
    re-evaluated the full tokenize (split + filter HOF, interpreted,
    no codegen CSE) up to four times per row. Measured 5.5 s -> 1.5 s
    on the 2.7M-bigram corpus explode at the measurement SF."""
    toks = tokens_col(F.lower(F.col(text_col)))
    return (docs
            .select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
            .select("doc_id", F.explode(F.expr(
                "case when size(_t) >= 2 then arrays_zip("
                "slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1)"
                ") else array() end")).alias("_b"))
            .select("doc_id", F.col("_b.0").alias("w1"),
                    F.col("_b.1").alias("w2")))


def lm_bits_score(docs: DataFrame, ref_docs: DataFrame | None = None,
                  threshold: float = 9.0,
                  text_col: str = "text",
                  id_col: str = "doc_id",
                  broadcast_counts: bool = True) -> DataFrame:
    """Per doc: total quantized surprisal bits, bigram count,
    bits_per_token (int/int double — exact), keep flag.

    ``ref_docs`` is the clean training corpus (defaults to ``docs``
    itself — self-trained). Docs with fewer than two tokens have no
    bigrams and are absent (nothing to score — callers keep them).

    ``broadcast_counts`` (r6, guide §3.1): the CCNet deployment shape
    ships the reference LM to every worker (KenLM model files on each
    node); the count tables here are vocabulary-bounded (distinct
    reference bigrams, << corpus occurrences), so by default they are
    broadcast and the corpus occurrence side is never shuffled by
    (w1, w2)/(w1) — its only exchange is the final per-doc rollup.
    Size estimates after aggregation are unreliable, hence the
    explicit hint rather than trusting the planner. Pass ``False``
    when the reference is itself corpus-scale (self-trained on the
    full input) to fall back to shuffled joins.
    """
    if ref_docs is None:
        ref_docs = docs
    ref_bg = bigram_rows(ref_docs, text_col, id_col)
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    # r6: context counts are an exact rollup of the bigram counts
    # (sum over w2 of c(w1,w2) == c(w1)); deriving c1 from c2 makes the
    # two count tables share ONE reference-corpus explode via
    # ReuseExchange instead of scanning the reference twice.
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    if broadcast_counts:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    ref_toks = tokens_col(F.lower(F.col(text_col)))
    vocab = (ref_docs.select(F.explode(ref_toks).alias("w"))
             .agg(F.countDistinct("w").alias("v")))
    bg = bigram_rows(docs, text_col, id_col)
    scored = (bg.join(c2, ["w1", "w2"], "left")
              .join(c1, ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .select(
                  "doc_id",
                  (_floorlog2(F.coalesce(F.col("n1"), F.lit(0))
                              + F.col("v"))
                   - _floorlog2(F.coalesce(F.col("n2"), F.lit(0)) + 1))
                  .alias("bits")))
    agg = scored.groupBy("doc_id").agg(
        F.sum("bits").alias("bits"),
        F.count("*").alias("n_bigrams"))
    bpt = F.col("bits").cast("double") / F.col("n_bigrams")
    return agg.select(
        "doc_id", F.col("bits").cast("long").alias("bits"), "n_bigrams",
        bpt.alias("bits_per_token"),
        (bpt < F.lit(threshold)).alias("keep"))
