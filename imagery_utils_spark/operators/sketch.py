"""KMV (k-minimum-values) distinct-count sketch — deterministic and
cross-engine exact.

Bar-Yossef et al. 2002: the k smallest hash values of a set determine
an unbiased cardinality estimate ``(k-1) * M / h_(k)`` (M = hash-space
size, h_(k) = k-th minimum). Unlike HLL the sketch is a plain sorted
list of longs, so it is:

* **mergeable** — union of sketches = k smallest of the concatenation,
  i.e. a ``groupBy`` + per-group top-k, map-side combinable (each
  partition contributes at most k values — the shuffle carries
  O(k x groups), never the raw distinct values);
* **deterministic** — the estimate depends only on the hash function
  and the set, not on partitioning, traversal order, or merge order;
  the same job at N and 4N executors emits identical sketches, and a
  SQL engine can replay it bit-for-bit.

Hash contract: the first 15 hex chars of sha256(value) parsed as an
integer — a 60-bit value that fits signed int64 on both engines (Spark
``conv(hex, 16, 10)``; DuckDB ``('0x' || hex)::bigint``), avoiding
engine-specific hash functions (xxhash64/murmur differ across
engines) and any decimal/shift gymnastics.

The estimate ``(k-1) * 2^60 / h_(k)`` is one int/int double division —
exact IEEE, same on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sha_hash63_col", "kmv_sketch", "kmv_estimate",
           "cms_hash_col", "cms_build", "cms_query",
           "hll_registers", "hll_estimate"]

HASH_SPACE = 1 << 60


def sha_hash63_col(value) -> F.Column:
    """Deterministic 60-bit hash: first 15 hex chars of sha256 -> int64."""
    hx = F.substring(F.sha2(value.cast("string"), 256), 1, 15)
    return F.conv(hx, 16, 10).cast("long")


def kmv_sketch(df: DataFrame, group_cols: list[str], value,
               k: int = 64) -> DataFrame:
    """Per group: sorted array of the k smallest distinct hashes.

    Distinct-before-rank matters (duplicate values share a hash and
    must count once); the rank runs per group over the DISTINCT hash
    set. At scale the pre-distinct is map-side combinable and the
    window input is already collapsed to distinct hashes."""
    h = sha_hash63_col(value).alias("_h")
    d = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(*group_cols)
            .agg(F.sort_array(F.collect_list("_h")).alias("sketch")))


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Cardinality estimate per group: exact count when the sketch is
    not full (fewer than k distinct values — the sketch IS the set),
    else (k-1) * 2^63 / h_(k)."""
    n = F.size("sketch")
    kth = F.element_at("sketch", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / kth)
    return sketches.withColumn("est_distinct", est)


# ---------------------------------------------------- Count-Min sketch

def cms_hash_col(value, row: int, width: int) -> F.Column:
    """Row-salted deterministic CMS column index: sha256 of
    'r:value' -> 60-bit int -> % width. Same algebra in SQL."""
    salted = F.concat(F.lit(f"{row}:"), value.cast("string"))
    return sha_hash63_col(salted) % width


def cms_build(df: DataFrame, value, depth: int = 4,
              width: int = 256, weight=None) -> DataFrame:
    """Count-Min sketch (Cormode-Muthukrishnan 2005) as a DataFrame:
    (r, c, cnt) cells, r < depth, c < width.

    Determinism/merge contract mirrors the KMV sketch: cells are plain
    integer sums — associative, commutative, partition-independent —
    so sketches from different partitions/days/clusters merge by
    elementwise addition (a groupBy), and the same stream at N and 4N
    executors yields the identical sketch. Build cost: one projection
    emitting ``depth`` (r, c) pairs per row (array + explode, JVM),
    one (r, c) groupBy whose key space is depth x width — map-side
    combine collapses everything long before the shuffle.

    ``weight`` (r6): cells are per-value sums, so a pre-aggregated
    (value, n) table with ``weight=n`` builds the IDENTICAL sketch
    while hashing each distinct value once instead of once per
    occurrence (guide §2.3 — aggregate before you shuffle)."""
    pairs = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 cms_hash_col(value, r, width).alias("c"))
        for r in range(depth)
    ])
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    return (df.select(F.explode(pairs).alias("_p"), w.alias("_w"))
            .select("_p.r", "_p.c", "_w")
            .groupBy("r", "c").agg(F.sum("_w").alias("cnt")))


def cms_query(cms: DataFrame, queries: DataFrame, value,
              depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimates for ``queries`` rows: min over the sketch rows
    — the classic CMS upper bound (never under-counts; over-counts
    only via collisions, P[err] bounded by (e/width)^depth-ish).
    Missing cells read as 0 via the left join + coalesce."""
    probes = queries.select(
        value.alias("q"),
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("r"),
                     cms_hash_col(value, r, width).alias("c"))
            for r in range(depth)
        ])).alias("_p")).select("q", "_p.r", "_p.c")
    return (probes.join(cms, ["r", "c"], "left")
            .groupBy("q")
            .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est")))


# ---------------------------------------------------- HyperLogLog

HLL_P = 6                 # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_SUB_BITS = 60 - HLL_P  # 54-bit sub-word below the register index
HLL_K = HLL_SUB_BITS + 1   # max rho (all-zero sub-word)
# alpha_m * m^2 * 2^K as one double literal — replayed verbatim in SQL
# (repr() round-trips, so both engines parse the identical IEEE double
# and the estimate is ONE int->double division on each side).
HLL_EST_NUM = 0.709 * HLL_M * HLL_M * float(1 << HLL_K)


def hll_registers(df: DataFrame, group_cols: list[str], value) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) per group:
    ``j = top-6-bits(hash)``, ``rho = leading-zeros-of-54-bit-rest + 1``,
    register = ``max(rho)``.

    Scale contract — and the contrast with :func:`kmv_sketch`: the
    register update is a plain ``max``, which is *idempotent* as well
    as associative/commutative, so the build needs NO pre-distinct
    (duplicates collapse for free), the shuffle key space is
    ``groups x 64`` regardless of input size, and map-side combine
    does almost all the work. The same stream at any partitioning /
    cluster size yields bit-identical registers. rho uses the exact
    integer bit-length (``length(bin(w))`` <-> ``length(printf('%b',w))``)
    — no floating log2 anywhere."""
    h = sha_hash63_col(value)
    j = F.shiftright(h, HLL_SUB_BITS)          # 60-bit value: top 6 bits
    w = h.bitwiseAND(F.lit((1 << HLL_SUB_BITS) - 1))
    rho = F.when(w == 0, F.lit(HLL_K)).otherwise(
        F.lit(HLL_K) - F.length(F.bin(w)))
    return (df.select(*group_cols, j.alias("j"), rho.alias("rho"))
            .groupBy(*group_cols, "j")
            .agg(F.max("rho").alias("m")))


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate from registers, cross-engine exact.

    ``sum(2^-M[j])`` over all m registers is rescaled to the integer
    ``S = sum(2^(K - M[j]))`` (absent registers contribute ``2^K``;
    S <= 64 * 2^55 < 2^63), so the only float op is the final
    ``HLL_EST_NUM / S`` division. Emits n_regs, s_sum, est_raw and a
    sha over the sorted ``j:M`` pairs that pins the whole register
    file (any partitioning-dependence would flip it)."""
    g = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_K} - m)"))
        .alias("_sp"),
        F.sort_array(F.collect_list(
            F.concat_ws(":", F.col("j").cast("string"),
                        F.col("m").cast("string")))).alias("_rl"))
    s_sum = (F.col("_sp")
             + (F.lit(HLL_M) - F.col("n_regs")).cast("long")
             * F.lit(1 << HLL_K).cast("long")).alias("s_sum")
    return g.select(
        *group_cols, "n_regs", s_sum,
        (F.lit(HLL_EST_NUM) / (F.col("_sp")
         + (F.lit(HLL_M) - F.col("n_regs")).cast("long")
         * F.lit(1 << HLL_K).cast("long"))).alias("est_raw"),
        F.sha2(F.concat_ws(",", "_rl"), 256).alias("reg_sha"))
