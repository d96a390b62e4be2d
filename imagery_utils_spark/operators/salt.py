"""Explicit salted repartitioning for hot cells (north-rule requirement).

Map-side partial aggregation + AQE shuffle-split cover most skew, but two
shapes need an explicit salt:

* **holistic aggregates** (collect_list/collect_set, grouped-map) where no
  partial combine exists — one hot cell lands its entire payload in one task;
* **joins against a hot-key build side** where AQE's skew split cannot apply
  (e.g. broadcast is too big and one key dominates the stream side).

:func:`salted_aggregate` runs groupBy in two phases: phase 1 groups on
(key, salt) with ``salt = pmod(hash(row-id-ish), n_salts)`` so the hot key
splits across ``n_salts`` tasks; phase 2 merges the per-salt partials. The
caller supplies both the partial and the merge aggregates (the classic
combiner contract).

:func:`salted_explode_join` replicates a small hot build side ``n_salts``
times so a stream-side salt column turns one hot key into ``n_salts``
balanced join keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, from_col: str | None = None,
              out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hashed from ``from_col`` (or a
    per-row random-ish monotonic id when absent)."""
    src = F.col(from_col) if from_col else F.monotonically_increasing_id()
    return df.withColumn(out, F.pmod(F.hash(src), F.lit(n_salts)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs`` combine
    the per-salt partial rows per key (they see the partial columns by their
    aliases). Example — skew-safe collect_list:

        salted_aggregate(df, ["cell"],
            [F.collect_list("v").alias("vs")],
            [F.flatten(F.collect_list("vs")).alias("vs")])
    """
    phase1 = (
        with_salt(df, n_salts, from_col=salt_from)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_explode_join(
    stream: DataFrame,
    hot_build: DataFrame,
    on: str,
    n_salts: int = 16,
    stream_salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``hot_build`` (small but hot-keyed) is replicated
    n_salts times; each stream row picks one replica via its salt — the hot
    key's stream rows spread over n_salts tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    build = hot_build.select("*", salts)
    s = with_salt(stream, n_salts, from_col=stream_salt_from)
    return s.join(build, [on, "_salt"], how).drop("_salt")
