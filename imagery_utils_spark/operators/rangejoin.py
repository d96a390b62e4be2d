"""Broadcast range-join lookup: point value -> covering interval.

The IP-geolocation join (ip BETWEEN range_lo AND range_hi) is the
canonical web-log enrichment; the reference's analog is its DEM
containment pick (operators/catalog.dem_containing). A naive range
join is O(n*m); the two production strategies are

1. **broadcast + band predicate** (this operator's default): the range
   table is dimension-sized (GeoIP ~10M rows max), so broadcast it and
   let the executor evaluate the band predicate per probe row —
   BroadcastNestedLoopJoin, zero fact shuffle. Fine when ranges fit in
   memory; the per-probe scan cost is bounded by prefix-bucketing
   below.
2. **prefix bucketing**: tag both sides with the value's high bits
   (``bucket_bits``) and equi-join on the bucket first — ranges
   spanning a bucket boundary are replicated into every bucket they
   touch. This turns the nested-loop into a hash join whose per-key
   fan-out is the ranges-per-bucket density, the same cell-cover trick
   the engine's spatial join uses (operators/spatial_join.py).

Non-overlap contract: ranges must be disjoint (the lookup is a
function); gaps yield NULL enrichment (left join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_lookup"]


def range_lookup(probes: DataFrame, ranges: DataFrame, value_col: str,
                 lo_col: str = "lo", hi_col: str = "hi",
                 bucket_bits: int | None = None) -> DataFrame:
    """Left-join each probe row to the (single) range covering
    ``value_col``. With ``bucket_bits`` set, both sides are bucketed by
    ``value >> bucket_bits`` first (ranges replicated across touched
    buckets via sequence+explode) and the join is a hash equi-join on
    the bucket plus the band predicate; otherwise a broadcast band
    join."""
    v = F.col(value_col)
    band = (v >= F.col(lo_col)) & (v <= F.col(hi_col))
    if bucket_bits is None:
        return probes.join(F.broadcast(ranges), band, "left")
    probe_b = probes.withColumn(
        "_rb", F.shiftrightunsigned(v.cast("long"), bucket_bits))
    range_b = ranges.withColumn(
        "_rb", F.explode(F.sequence(
            F.shiftrightunsigned(F.col(lo_col).cast("long"), bucket_bits),
            F.shiftrightunsigned(F.col(hi_col).cast("long"), bucket_bits))))
    return (probe_b.join(range_b,
                         (probe_b["_rb"] == range_b["_rb"]) & band,
                         "left")
            .drop("_rb"))
