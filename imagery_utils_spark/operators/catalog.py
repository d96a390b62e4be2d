"""Catalog-side join operators (S3/J4/J5/J6/J7/O5 analogs).

Each is a composition of built-in DataFrame ops — broadcast equi/theta joins
plus window top-1 — chosen so the big (fact) side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def load_exclude_list(spark, source, pattern_col: str = "pattern") -> DataFrame:
    """S4 completion — the ``getExcludeList`` source forms
    (/root/reference/lib/mosaic.py:1035-1052) as one loader:

    * a DataFrame -> passed through (renamed to ``pattern_col``);
    * an ``http(s)://`` URL -> fetched driver-side (stdlib urllib, the
      requests.get analog); a JSON array body is treated like the reference's
      API response (``response.json()`` joined/split on line endings), any
      other body as plain lines;
    * anything else -> a local text file of one pattern per line.

    Lines are ``rstrip``-ed and de-duplicated (the reference builds a set),
    then parallelized to a DataFrame — exclude lists are the broadcast-small
    side of the anti-join by construction. All three source forms normalize
    identically (trim + distinct, ADVICE r2); URL fetches carry a timeout so
    a hung endpoint cannot block the driver indefinitely."""
    import json

    if isinstance(source, DataFrame):
        pat = F.rtrim(F.col(source.columns[0]).cast("string"))
        return (source.select(pat.alias(pattern_col))
                .filter(F.col(pattern_col) != "").distinct())
    if isinstance(source, str) and source.startswith(("http://", "https://")):
        from urllib.request import urlopen

        body = urlopen(source, timeout=30).read().decode("utf-8")
        stripped = body.lstrip()
        if stripped.startswith("["):
            import os

            lines = os.linesep.join(json.loads(body)).splitlines()
        else:
            lines = body.splitlines()
    else:
        with open(source) as f:
            lines = f.readlines()
    pats = sorted({ln.rstrip() for ln in lines if ln.rstrip()})
    return spark.createDataFrame([(p,) for p in pats], f"{pattern_col} string")


def exclude_anti_join(df: DataFrame, patterns: DataFrame, target_col: str,
                      pattern_col: str = "pattern") -> DataFrame:
    """S3/F10 — drop rows whose ``target_col`` *contains* any exclude pattern
    (substring semantics of find_images_with_exclude_list,
    /root/reference/lib/utils.py:228-265). Patterns are broadcast; the fact
    table is scanned once (theta anti-join on contains)."""
    return df.join(
        F.broadcast(patterns),
        F.col(target_col).contains(F.col(pattern_col)),
        "left_anti",
    )


def rect_iou_col(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> Column:
    """Intersection-over-union of two rectangles (column algebra)."""
    ix = F.greatest(F.lit(0.0), F.least(ax1, bx1) - F.greatest(ax0, bx0))
    iy = F.greatest(F.lit(0.0), F.least(ay1, by1) - F.greatest(ay0, by0))
    inter = ix * iy
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def stereo_overlap_pairs(footprints: DataFrame, id_col: str = "strip_id",
                         min_iou: float = 0.10) -> DataFrame:
    """J6 — all-pairs overlap self-join with IoU gate
    (/root/reference/utility_scripts/pgc_get_scene_overlaps_standalone.py:508-540:
    keep pairs with different ids that Intersect and IoU >= 0.10).
    Footprint side is small (strip/catalog granularity) -> broadcast self-join."""
    a = footprints.select(
        F.col(id_col).alias("id_a"),
        F.col("s_xmin").alias("ax0"), F.col("s_ymin").alias("ay0"),
        F.col("s_xmax").alias("ax1"), F.col("s_ymax").alias("ay1"),
    )
    b = footprints.select(
        F.col(id_col).alias("id_b"),
        F.col("s_xmin").alias("bx0"), F.col("s_ymin").alias("by0"),
        F.col("s_xmax").alias("bx1"), F.col("s_ymax").alias("by1"),
    )
    iou = rect_iou_col(F.col("ax0"), F.col("ay0"), F.col("ax1"), F.col("ay1"),
                       F.col("bx0"), F.col("by0"), F.col("bx1"), F.col("by1"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .withColumn("iou", iou)
        .filter(F.col("iou") >= min_iou)
        .select("id_a", "id_b", "iou")
    )


def containment_min_rank_pick(points: DataFrame, rects: DataFrame,
                              lon: str = "lon", lat: str = "lat",
                              rank_col: str = "rank",
                              payload: str = "dempath") -> DataFrame:
    """J7/O5 — for each point: among containing rectangles, the one with the
    smallest rank (check_image_auto_dem,
    /root/reference/lib/ortho_functions.py:2054-2130: scan layers, keep
    containing features, select min rank). Broadcast containment join +
    row_number top-1."""
    joined = points.join(
        F.broadcast(rects),
        (F.col(lon) >= F.col("xmin")) & (F.col(lon) <= F.col("xmax"))
        & (F.col(lat) >= F.col("ymin")) & (F.col(lat) <= F.col("ymax")),
        "inner",
    )
    w = Window.partitionBy(points.columns[0]).orderBy(F.asc(rank_col), F.asc(payload))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def intersect_extent_join(a: DataFrame, b: DataFrame,
                          a_id: str = "id_a", b_id: str = "id_b",
                          broadcast_b: bool = True) -> DataFrame:
    """J8 — pairwise rectangle-intersection extent join: the reference's
    overlap_check / target-extent clip (/root/reference/lib/ortho_functions.py
    :1442-1459 getstrips intersection; pgc_mosaic.py:520-531 tile-extent
    clip): keep pairs whose envelopes overlap with positive area and emit
    the intersection extent (greatest/least of the edges) plus its area.

    ``a`` carries (a_id, axmin, aymin, axmax, aymax); ``b`` carries
    (b_id, bxmin, bymin, bxmax, bymax). ``b`` is the small side (tile grid /
    DEM footprints) -> broadcast by default so the fact side never shuffles;
    the overlap predicate is a pure JVM range condition (BroadcastNestedLoop
    with a pushed range filter — at 100 TB pre-bucket ``a`` by coarse cell
    and equi-join on cell to bound the pair space, as spatial_join does)."""
    bb = F.broadcast(b) if broadcast_b else b
    ix0 = F.greatest(F.col("axmin"), F.col("bxmin"))
    iy0 = F.greatest(F.col("aymin"), F.col("bymin"))
    ix1 = F.least(F.col("axmax"), F.col("bxmax"))
    iy1 = F.least(F.col("aymax"), F.col("bymax"))
    return (
        a.join(bb, (F.col("axmin") < F.col("bxmax"))
               & (F.col("bxmin") < F.col("axmax"))
               & (F.col("aymin") < F.col("bymax"))
               & (F.col("bymin") < F.col("aymax")), "inner")
        .select(
            a_id, b_id,
            ix0.alias("ixmin"), iy0.alias("iymin"),
            ix1.alias("ixmax"), iy1.alias("iymax"),
            ((ix1 - ix0) * (iy1 - iy0)).alias("ix_area"),
        )
    )
