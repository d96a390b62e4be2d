"""As-of / tolerance joins (J4: pan<->multi pair matching).

The reference matches a multispectral scene to its panchromatic partner by a
derived key, retrying with the timestamp shifted -1 s on a miss
(/root/reference/lib/mosaic.py:65-85, pgc_mosaic_query_index.py:332-350;
the filesystem variant tries +/-1 s, pgc_pansharpen.py:133-165).

Two operators:

* :func:`join_with_fallback_keys` — equi-join on a primary derived key,
  falling back to secondary key(s) for rows that missed (exactly the
  reference's retry ladder). Implemented as K broadcast/shuffle equi-joins +
  ``coalesce``; each join is a plain Catalyst equi-join, so AQE picks the
  physical strategy.
* :func:`asof_backward` — generic "most recent right row at or before each
  left row" per partition key, the classic as-of join. Implemented with the
  union + window trick: one shuffle on (key), no range cross-product —
  the scalable formulation (a naive theta-join explodes at 10^12 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_with_fallback_keys(
    left: DataFrame,
    right: DataFrame,
    key_pairs: list[tuple[str, str]],
    how: str = "left",
) -> DataFrame:
    """Try ``left[k_l] == right[k_r]`` for each (k_l, k_r) in order; the first
    hit wins per left row. ``right`` columns (minus keys) are appended.

    Reference semantics: exact-timestamp pan id first, then the -1 s variant
    (lib/mosaic.py:65-85). Right side must be unique per key."""
    payload_cols = [c for c in right.columns if c not in {k for _, k in key_pairs}]
    out = left
    hit_cols = []
    for i, (kl, kr) in enumerate(key_pairs):
        r = right.select(
            F.col(kr).alias(f"__k{i}"),
            *[F.col(c).alias(f"__p{i}_{c}") for c in payload_cols],
        )
        out = out.join(F.broadcast(r) if how == "left" else r,
                       out[kl] == F.col(f"__k{i}"), "left").drop(f"__k{i}")
        hit_cols.append(i)
    for c in payload_cols:
        out = out.withColumn(c, F.coalesce(*[F.col(f"__p{i}_{c}") for i in hit_cols]))
        out = out.drop(*[f"__p{i}_{c}" for i in hit_cols])
    if how == "inner":
        out = out.filter(F.coalesce(*[F.col(c) for c in payload_cols]).isNotNull())
    return out


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_ts_out: str = "asof_ts",
    tolerance_seconds: float | None = None,
    right_payload: list[str] | None = None,
) -> DataFrame:
    """For each left row: the most recent right row with ``right.ts <=
    left.ts`` and equal ``on`` key. Union + window: sort within key by
    (ts, is_left) and carry the last right timestamp/payload forward.

    One shuffle on ``on`` — survives arbitrary scale; skewed keys are split
    by AQE since the window partition matches the shuffle partitioning.
    """
    right_payload = right_payload or []
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("timestamp").alias("__r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c != on else F.col(on)
          for c in lcols],
        F.lit(0).alias("__is_left"),
        F.col(ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    ).withColumn(ts, F.col("__r_ts"))
    u = l.unionByName(r)
    # right rows sort before left rows at the same timestamp => "at or before"
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(right_ts_out, F.last("__r_ts", ignorenulls=True).over(w))
    for c in right_payload:
        u = u.withColumn(c + "_asof", F.last(f"__r_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__is_left") == 1).drop(
        "__is_left", "__r_ts", *[f"__r_{c}" for c in right_payload]
    )
    if tolerance_seconds is not None:
        within = (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(F.col(right_ts_out))
        ) <= tolerance_seconds
        out = out.withColumn(
            right_ts_out, F.when(within, F.col(right_ts_out))
        )
        for c in right_payload:
            out = out.withColumn(c + "_asof", F.when(within, F.col(c + "_asof")))
    return out
