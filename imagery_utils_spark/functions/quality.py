"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1 — public) for webtext filtering:
per-document scalar heuristics plus the repetition metrics, each with an
explicit keep threshold, composed as one DataFrame operator.

Scale shape (r6): every metric — scalars AND the repetition metrics —
is per-document, so the whole operator is ONE projection over the token
array (whole-stage codegen, zero shuffles, zero joins): duplicate-line
fractions via array_distinct character totals, the top 2-gram via an
array_sort + run-length fold. Per-doc cost is O(L log L), bounded by
document length; no O(L²) array lambdas anywhere.

Conventions (pinned so the SQL oracle is value-identical, not merely
similar):

* words = whitespace-split tokens, empties dropped.
* duplicate-line char fraction = chars in occurrences AFTER the first /
  total line chars (each line weighted by its occurrence count).
* top-2-gram char fraction = max over 2-grams of count(gram) ×
  chars(gram, space excluded) / total word chars — the count×chars
  maximization makes ties deterministic without a gram-order tiebreak.

Thresholds (Gopher Table A1): 50 ≤ words ≤ 100000; 3 ≤ mean word length
≤ 10; symbol-to-word ratio ('#' or '...') ≤ 0.1; ≥ 80% of words contain
an alphabetic character; ≥ 2 distinct stop words; duplicate-line
fraction ≤ 0.30; duplicate-line char fraction ≤ 0.20; top-2-gram char
fraction ≤ 0.20.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_quality", "GOPHER_STOPWORDS"]

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(df: DataFrame, text: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
                   materialize: bool = True,
                   ) -> DataFrame:
    """Per-document Gopher metrics + ``keep`` flag. Lines split on
    ``\\n``; see module docstring for pinned conventions/thresholds.
    ``materialize=False`` skips the staged-text checkpoint (plan
    inspection / callers that already materialized the text)."""
    # Materialize (id, text) once (r6): the metric expressions below
    # reference the text from several interpreted higher-order
    # functions, and CollapseProject would otherwise inline the
    # caller's upstream text derivation (e.g. the line-wrap regex) into
    # every consumer — measured ~6 redundant corpus passes at sf1.0.
    # Only the text is stored: re-splitting from materialized text is
    # cheaper than holding the token arrays in the block manager. On a
    # cluster pipeline this is the staged table between scan and
    # metric projection.
    src = df.select(F.col(id_col), F.col(text).alias("_t"))
    if materialize:
        src = src.localCheckpoint()
    words = F.filter(F.split(F.col("_t"), r"\s+"),
                     lambda w: w != F.lit(""))
    base = src.select(F.col(id_col), F.col("_t"), words.alias("_w"))

    n = F.size("_w")
    sum_len = F.aggregate("_w", F.lit(0),
                          lambda acc, x: acc + F.length(x))
    n_hash = F.length("_t") - F.length(F.expr("replace(_t, '#', '')"))
    n_ellip = ((F.length("_t")
                - F.length(F.expr("replace(_t, '...', '')"))) / 3
               ).cast("long")
    n_alpha = F.size(F.filter("_w", lambda x: x.rlike("[a-zA-Z]")))
    stops = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.array_intersect(
        F.transform("_w", F.lower), stops))

    safe = lambda num, den: F.when(den > 0, num / den).otherwise(F.lit(0.0))

    # r6: every metric here is PER-DOCUMENT, so the explode ->
    # groupBy(doc, unit) -> groupBy(doc) -> join pipelines (3 corpus
    # scans, 4 exchanges, 2 joins) collapse into within-row array
    # algebra: duplicate-line fractions from array_distinct totals, the
    # top 2-gram from a sort + run-length fold over the zipped pair
    # array. One scan, zero shuffles, identical values. Cost per doc is
    # O(L log L) in its own task — bounded by document length; the
    # million-line adversarial doc is one task's sort rather than a
    # shuffled rollup, which is the right trade until single documents
    # stop fitting a task.
    lines = F.filter(F.split("_t", "\n"), lambda x: x != F.lit(""))
    dlines = F.array_distinct(lines)
    chars_of = lambda arr: F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    n_lines = F.size(lines)
    total_chars = chars_of(lines)
    dist_chars = chars_of(dlines)
    dup_line_frac = safe((n_lines - F.size(dlines)).cast("double"),
                         n_lines.cast("double"))
    dup_line_char_frac = safe((total_chars - dist_chars).cast("double"),
                              total_chars.cast("double"))

    # top 2-gram weighted count: sort the pair array so equal grams are
    # contiguous, then one fold tracking (run gram, run length, best
    # count x chars). greatest() skips the null initial-gram term.
    pairs = F.array_sort(F.arrays_zip(
        F.expr("slice(_w, 1, greatest(size(_w) - 1, 0))").alias("a"),
        F.expr("slice(_w, 2, greatest(size(_w) - 1, 0))").alias("b"),
    ))
    _zero = F.lit(0).cast("long")
    init = F.struct(F.lit(None).cast("string").alias("pa"),
                    F.lit(None).cast("string").alias("pb"),
                    _zero.alias("run"), _zero.alias("best"))
    close_run = lambda acc: F.greatest(
        acc["best"],
        acc["run"] * (F.length(acc["pa"]) + F.length(acc["pb"])))
    step = lambda acc, x: F.when(
        acc["pa"].eqNullSafe(x["a"]) & acc["pb"].eqNullSafe(x["b"]),
        F.struct(acc["pa"].alias("pa"), acc["pb"].alias("pb"),
                 (acc["run"] + 1).alias("run"), acc["best"].alias("best"))
    ).otherwise(
        F.struct(x["a"].alias("pa"), x["b"].alias("pb"),
                 F.lit(1).cast("long").alias("run"),
                 close_run(acc).alias("best")))
    top2_w = F.aggregate(pairs, init, step, close_run)

    out = base.select(
        id_col,
        n.alias("n_words"),
        sum_len.alias("_sum_len"),
        safe(sum_len.cast("double"), n.cast("double"))
        .alias("mean_word_len"),
        safe((n_hash + n_ellip).cast("double"), n.cast("double"))
        .alias("symbol_word_ratio"),
        safe(n_alpha.cast("double"), n.cast("double"))
        .alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top2_w.alias("_top2"),
    )
    top2 = F.when(F.col("_sum_len") > 0,
                  F.coalesce(F.col("_top2"), F.lit(0)).cast("double")
                  / F.col("_sum_len").cast("double")).otherwise(F.lit(0.0))
    dlf = F.coalesce("dup_line_frac", F.lit(0.0))
    dlcf = F.coalesce("dup_line_char_frac", F.lit(0.0))
    keep = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= 3.0)
            & (F.col("mean_word_len") <= 10.0)
            & (F.col("symbol_word_ratio") <= 0.1)
            & (F.col("frac_alpha_words") >= 0.8)
            & (F.col("n_stopwords") >= 2)
            & (dlf <= 0.30) & (dlcf <= 0.20) & (top2 <= 0.20))
    return out.select(
        id_col, "n_words", "mean_word_len", "symbol_word_ratio",
        "frac_alpha_words", "n_stopwords",
        dlf.alias("dup_line_frac"),
        dlcf.alias("dup_line_char_frac"),
        top2.alias("top_2gram_char_frac"),
        keep.alias("keep"))
