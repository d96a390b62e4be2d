"""Deterministic corpus sampling — the mixture-building step of a
training-data pipeline: reproducible per-row sampling at an exact rate,
and per-domain caps (keep at most K pages per registrable domain, the
public C4/RefinedWeb recipe for de-biasing crawl frequency).

Determinism contract: every decision is a pure function of the row key —
re-running the pipeline, resuming it, or running it on a differently
partitioned copy of the data keeps IDENTICAL rows. No ``rand()``, no
``df.sample`` (both are partition-layout-dependent).

Scale shape: ``deterministic_sample`` is a pushed JVM filter — zero
shuffles, composes with partition pruning. ``domain_cap`` ranks inside
each domain via :func:`rank.rank_auto` — one shuffle on the domain key,
auto-gating into the two-phase skew path when a caller-provided estimate
says one domain (a mega-site) exceeds the single-task sort budget.

The default tie-free ordering hash is ``xxhash64`` (JVM-native). The
``hash_col`` hook exists because a cross-engine oracle needs a hash both
engines can evaluate bit-identically (the battery uses a Lehmer step,
:func:`lehmer_col` — same SQL in DuckDB); production callers keep the
default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import rank_auto

__all__ = ["lehmer_col", "deterministic_sample", "domain_cap",
           "mixture_stats"]

_LEHMER_MOD = 2147483647          # Mersenne-31
_LEHMER_MULT = 48271              # MINSTD multiplier
SAMPLE_DENOM = 1_000_000


def lehmer_col(key: Column) -> Column:
    """MINSTD Lehmer step of an integer key — (key mod p) * 48271 mod p,
    p = 2^31-1. Every intermediate fits int64 (p * 48271 < 2^48), so it
    is ANSI-overflow-safe in Spark and renders to the identical
    expression in ANSI SQL."""
    return F.pmod(F.pmod(key.cast("long"), F.lit(_LEHMER_MOD))
                  * _LEHMER_MULT, F.lit(_LEHMER_MOD))


def deterministic_sample(df: DataFrame, rate: float, key: Column,
                         hash_col: Column | None = None) -> DataFrame:
    """Keep each row iff hash(key) mod 1e6 < rate*1e6 — exact expected
    rate, reproducible under any partitioning, plain pushed filter."""
    h = hash_col if hash_col is not None else F.xxhash64(key)
    return df.filter(F.pmod(h, F.lit(SAMPLE_DENOM))
                     < int(rate * SAMPLE_DENOM))


def domain_cap(df: DataFrame, domain: str, cap: int,
               order: list[Column] | None = None,
               id_col: str = "doc_id",
               max_group_rows: int | None = None,
               out: str = "sample_rank") -> DataFrame:
    """Keep at most ``cap`` rows per ``domain``, chosen by the
    deterministic ``order`` (default: xxhash64(id), id — a reproducible
    uniform pick). ``max_group_rows`` feeds :func:`rank.rank_auto`'s
    skew gate for mega-domains."""
    if order is None:
        order = [F.xxhash64(F.col(id_col)), F.col(id_col)]
    # bucket monotone non-increasing along the ASC ordering (skew path)
    bucket = F.negative(F.floor(order[0].cast("double")
                                / F.lit(float(1 << 44))))
    ranked = rank_auto(df, domain, order, bucket, out=out,
                       max_group_rows=max_group_rows)
    return ranked.filter(F.col(out) <= cap)


def mixture_stats(df: DataFrame, group_cols: list[str],
                  text: str = "text") -> DataFrame:
    """Per-group corpus mixture statistics: doc/token counts, exact
    corpus share, and the √tokens sampling weight (temperature-scaled
    mixture with α = 0.5, the multilingual-T5 recipe — sqrt is IEEE
    correctly-rounded, so the weight is bit-reproducible across engines,
    unlike a general pow()).

    One groupBy shuffle with map-side partial aggregation; the corpus
    total joins back as a broadcast single row. The share is an
    int/int double division — exact, no float accumulation across rows.
    Normalizing weights to probabilities is the caller's last step (a
    tiny driver-side sum over #groups rows) because cross-row float
    sums are order-dependent and would break reproducibility."""
    from ..functions.text import token_count_col

    per_doc = df.select(*group_cols,
                        token_count_col(F.col(text)).alias("_nt"))
    g = (per_doc.groupBy(*group_cols)
         .agg(F.count("*").alias("n_docs"),
              F.sum("_nt").alias("n_tokens")))
    total = g.agg(F.sum("n_tokens").alias("_tot"))
    return (g.crossJoin(F.broadcast(total))
            .select(*group_cols, "n_docs", "n_tokens",
                    (F.col("n_tokens").cast("double")
                     / F.col("_tot").cast("double")).alias("share"),
                    F.sqrt(F.col("n_tokens").cast("double"))
                    .alias("samp_weight")))
