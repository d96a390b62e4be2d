"""Benchmark decontamination — flag training documents that share an
n-token gram with an evaluation/benchmark corpus (the public GPT-3
appendix-C / PaLM 13-gram overlap rule).

Scale shape: the benchmark side collapses to DISTINCT 64-bit gram
hashes and is broadcast (eval suites are tiny next to a 100-TB corpus),
so the fact table is scanned once, grams are generated JVM-side
(``transform``/``slice`` — no UDF), and the only shuffle is the per-doc
hit rollup with map-side partial aggregation. Joining on ``xxhash64``
of the gram instead of the ~100-byte gram string keeps the broadcast
and shuffle rows at 8 bytes; a (vanishingly unlikely) hash collision
only OVER-counts contamination — the safe direction for a filter whose
job is to drop suspect documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_ngrams", "token_ngram_hashes", "contamination_flags"]


def token_ngrams(df: DataFrame, n: int, text: str = "text",
                 id_col: str = "doc_id", out: str = "gram") -> DataFrame:
    """(id, gram) rows: whitespace tokens, space-joined n-grams.
    Documents shorter than ``n`` tokens produce no rows."""
    w = F.filter(F.split(F.col(text), r"\s+"), lambda x: x != F.lit(""))
    return (df.select(F.col(id_col), w.alias("_w"))
            .filter(F.size("_w") >= n)
            .select(
                id_col,
                F.explode(F.expr(
                    f"transform(sequence(1, size(_w) - {n - 1}), "
                    f"i -> concat_ws(' ', slice(_w, i, {n})))"))
                .alias(out)))


def token_ngram_hashes(df: DataFrame, n: int, text: str = "text",
                       id_col: str = "doc_id",
                       out: str = "gh") -> DataFrame:
    """(id, gram-hash) rows: 64-bit hash per n-gram, never building the
    gram string. Two wins over ``token_ngrams`` + ``xxhash64(gram)``
    (r6, guide §2.3/§1.2, measured 6.6 s -> 3.9 s on the 2.1M-gram
    corpus pass):

    * hashes the token *slice* directly (``xxhash64(array<string>)``)
      instead of materializing a ~100-byte ``concat_ws`` string per
      gram — tokens are whitespace-free, so slice identity and joined-
      string identity coincide (same collision class as before);
    * guards short documents with a ``CASE`` on the already-projected
      token array instead of a separate ``.filter`` — filter pushdown
      was re-substituting the full tokenize into the Filter node, so
      ``split`` ran twice per row.

    The hash VALUES differ from ``xxhash64(token_ngrams().gram)``;
    callers must use one convention on both sides of a join."""
    w = F.filter(F.split(F.col(text), r"\s+"), lambda x: x != F.lit(""))
    return (df.select(F.col(id_col), w.alias("_w"))
            .select(
                id_col,
                F.explode(F.expr(
                    f"case when size(_w) >= {n} then "
                    f"transform(sequence(1, size(_w) - {n - 1}), "
                    f"i -> xxhash64(slice(_w, i, {n}))) "
                    f"else array() end"))
                .alias(out)))


def contamination_flags(docs: DataFrame, bench: DataFrame, n: int = 13,
                        text: str = "text", id_col: str = "doc_id",
                        bench_text: str = "text") -> DataFrame:
    """Per training doc: distinct overlapping-gram count + contaminated
    flag. ``bench`` is reduced to distinct gram hashes and broadcast.
    Both sides hash token slices via :func:`token_ngram_hashes` (same
    gram <-> same slice <-> same hash; a collision only over-counts —
    the safe direction, as before)."""
    bg = (token_ngram_hashes(
            bench.select(F.lit(0).alias("_bid"),
                         F.col(bench_text).alias("_bt")),
            n, text="_bt", id_col="_bid")
          .select("gh").distinct())
    dg = token_ngram_hashes(docs, n, text=text, id_col=id_col).select(
        id_col, "gh")
    hits = (dg.join(F.broadcast(bg), "gh")
            .groupBy(id_col)
            .agg(F.countDistinct("gh").alias("n_contam_grams")))
    return (docs.select(id_col).join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("n_contam_grams", F.lit(0))
                    .alias("n_contam_grams"))
            .withColumn("contaminated", F.col("n_contam_grams") > 0))
