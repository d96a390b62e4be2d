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

__all__ = ["range_lookup", "interval_overlap_join"]


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


def interval_overlap_join(a: DataFrame, b: DataFrame, band: int,
                          a_start: str = "a_start", a_end: str = "a_end",
                          b_start: str = "b_start", b_end: str = "b_end",
                          ) -> DataFrame:
    """Interval × interval overlap join (closed intervals), banded.

    Both sides explode onto fixed-width bands (floor(start/band) ..
    floor(end/band)) and equi-join on the band id — the shuffle key a
    plain theta join doesn't have, which is what makes this run as a
    hash join instead of a cross product at 10^12 rows. A pair sharing
    several bands is emitted ONCE without any distinct pass: it is kept
    only in the band containing max(a_start, b_start), which for
    overlapping intervals is always a band both sides cover — the
    dedupe-free trick from interval-join literature (e.g. the
    "start-band" rule in Spark range-join implementations).

    ``band`` trades replication (interval_len/band copies per row)
    against per-band join density; pick it near the median interval
    length. Output: all columns of both inputs, one row per
    overlapping pair.
    """
    def banded(df, lo, hi):
        return df.withColumn("_band", F.explode(F.sequence(
            F.floor(F.col(lo) / band), F.floor(F.col(hi) / band))))

    ab = banded(a, a_start, a_end)
    bb = banded(b, b_start, b_end)
    overlap = ((F.col(a_start) <= F.col(b_end))
               & (F.col(b_start) <= F.col(a_end)))
    first_band = (F.col("_band")
                  == F.floor(F.greatest(F.col(a_start),
                                        F.col(b_start)) / band))
    return (ab.join(bb, "_band").filter(overlap & first_band)
            .drop("_band"))
