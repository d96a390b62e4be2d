"""Burrows–Wheeler transform (1994 DEC SRC report) — the
compression-stage permutation under bzip2-style codecs, in its exact
sentinel form: append a unique smallest sentinel, sort ALL rotations,
emit the last column; invert by the standard LF-mapping walk.

Engine construction: literal rotation sort (the definition). The
battery oracle derives the same column via the SUFFIX-ARRAY identity
(bwt[i] = s[sa[i]−1], sa from direct suffix sort) — equivalent only
because the sentinel is unique and smallest, which is exactly the
property worth pinning. Roundtrip (inverse ∘ forward = id) is asserted
inline on every row.

Scale shape: a per-document local transform (mapInPandas batch work,
embarrassingly parallel); block-sorting whole shards would be a
segmented sort, out of scope here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SENTINEL = "\x01"

__all__ = ["SENTINEL", "bwt_forward", "bwt_inverse", "invert_bwt_df"]


def bwt_forward(s: str) -> str:
    """Rotation-sort BWT of s + sentinel (s must not contain it)."""
    if SENTINEL in s:
        raise ValueError("input contains the sentinel")
    t = s + SENTINEL
    n = len(t)
    rot = sorted(t[i:] + t[:i] for i in range(n))
    return "".join(r[-1] for r in rot)


def bwt_inverse(b: str) -> str:
    """LF-mapping inversion; strips the sentinel."""
    n = len(b)
    # rank of each char occurrence + first-column start offsets
    counts: dict[str, int] = {}
    ranks = []
    for ch in b:
        ranks.append(counts.get(ch, 0))
        counts[ch] = counts.get(ch, 0) + 1
    first: dict[str, int] = {}
    total = 0
    for ch in sorted(counts):
        first[ch] = total
        total += counts[ch]
    # walk from the sentinel's row (it terminates the original string)
    row = b.index(SENTINEL)
    out = []
    for _ in range(n - 1):
        row = first[b[row]] + ranks[row]
        out.append(b[row])
    return "".join(reversed(out))


def invert_bwt_df(chars: DataFrame, doc: str = "doc",
                  pos: str = "j", ch: str = "c",
                  max_len: int = 4096) -> DataFrame:
    """DISTRIBUTED BWT inversion — no per-row Python, no sequential
    walk. Input: one row per BWT character (doc, j, c), sentinel
    included. Output: (doc, i, out_c) — the recovered string (sentinel
    stripped) as positioned character rows.

    The LF mapping LF(j) = C[c_j] + rank_{c_j}(j) is a single n-cycle
    permutation (the sentinel guarantees it), and the stepwise
    inversion walk is exactly "position along that cycle". Position is
    computed by Wyllie pointer doubling (Wyllie 1979 list ranking):
    cut the cycle at the sentinel row, then ⌈log₂ n⌉ rounds of
    ptr(v), d(v) ← ptr(ptr(v)), d(v)+d(ptr(v)) — each round ONE
    equi-join on (doc, ptr), so the whole inversion is O(log n)
    shuffles instead of n sequential lookups. The battery oracle runs
    the textbook O(n) recursive-CTE walk; agreement pins the
    list-ranking reformulation.
    """
    base = (chars.select(F.col(doc).alias("doc"),
                         F.col(pos).cast("long").alias("j"),
                         F.col(ch).alias("c"))
            .withColumn("n", F.count(F.lit(1)).over(
                Window.partitionBy("doc")))
            .withColumn("occ", F.row_number().over(
                Window.partitionBy("doc", "c").orderBy("j")) - 1))
    # C[c] = number of characters strictly smaller than c in the doc
    cnt = base.groupBy("doc", "c").agg(F.count(F.lit(1)).alias("k"))
    c_w = (Window.partitionBy("doc").orderBy("c")
           .rowsBetween(Window.unboundedPreceding, -1))
    offs = cnt.withColumn("off", F.coalesce(F.sum("k").over(c_w),
                                            F.lit(0)))
    lf = (base.join(offs.select("doc", "c", "off"), ["doc", "c"])
          .withColumn("lf", F.col("off") + F.col("occ")))
    # cut the cycle at the sentinel row, then pointer-double distances
    start = F.col("c") == F.lit(SENTINEL)
    r = (lf.select(
        "doc", "j", "c", "n",
        F.when(start, F.col("j")).otherwise(F.col("lf")).alias("ptr"),
        F.when(start, F.lit(0)).otherwise(F.lit(1))
         .cast("long").alias("d"))
        .localCheckpoint(eager=True))
    k = 1
    while k < max_len:
        nxt = r.select("doc", F.col("j").alias("ptr"),
                       F.col("ptr").alias("ptr2"),
                       F.col("d").alias("d2"))
        r = (r.join(nxt, ["doc", "ptr"])
             .select("doc", "j", "c", "n",
                     F.col("ptr2").alias("ptr"),
                     (F.col("d") + F.col("d2")).alias("d"))
             .localCheckpoint(eager=True))
        k *= 2
    # d = steps from v to the start row; the walk index of v is
    # (n - d) mod n, and its character lands at output n-1-walk.
    walk = (F.col("n") - F.col("d")) % F.col("n")
    return (r.withColumn("wk", walk)
            .filter(F.col("wk") >= 1)
            .select("doc", (F.col("n") - 1 - F.col("wk")).alias("i"),
                    F.col("c").alias("out_c")))
