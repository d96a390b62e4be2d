"""Slowly-changing-dimension (type 2) interval build from a change log.

A crawl/mosaic catalog is a change log: the same entity (host, tile,
scene id) is re-observed over time with possibly-changed attributes, and
downstream joins need "the attribute value that was current AT time t".
The reference keeps only latest-wins state (pgc_mosaic re-runs rebuild
the whole mosaic from the newest scene set); at warehouse scale the
idiomatic answer is an SCD2 dimension — one validity interval per
distinct consecutive attribute value:

    (key, attr, valid_from, valid_to NULL-for-current, is_current)

Construction is two narrow window passes over the SAME partitioning
(partition by key, order by ts + a total-order tie-break), so Catalyst
plans ONE shuffle and both windows run in the same stage:

 1. change-point filter: lag(attr) — keep rows where the attribute
    actually changed (consecutive duplicates collapse, real SCD2
    semantics, and the dominant data reduction: most re-observations
    don't change the attribute);
 2. interval close: lead(ts) over the surviving change points.

Scale shape: one hash shuffle on key; per-key data is a short sorted
run (windows spill if a key is hot, and a hot key means "one entity
re-observed billions of times", which the change-point filter collapses
before the second pass materializes anything). No driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_intervals"]


def scd2_intervals(log: DataFrame, key: str, attr: str, ts: str,
                   tiebreak: str) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    ``tiebreak`` must make (key, ts, tiebreak) a total order — interval
    semantics with tied timestamps are otherwise partition-dependent.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    # row_number (not lag-is-null) marks the first observation, so a
    # NULL attribute still collapses consecutive duplicates correctly
    changed = (log.withColumn("_prev", F.lag(attr).over(w))
               .withColumn("_rn", F.row_number().over(w))
               .filter((F.col("_rn") == 1)
                       | ~F.col("_prev").eqNullSafe(F.col(attr))))
    return (changed
            .withColumn("valid_to", F.lead(ts).over(w))
            .select(F.col(key), F.col(attr),
                    F.col(ts).alias("valid_from"), "valid_to",
                    F.col("valid_to").isNull().alias("is_current")))
