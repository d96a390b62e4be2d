import numpy as np
import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def brute_force_topk(emb_rows, q, k):
    sims = []
    qn = np.asarray(q) / np.linalg.norm(q)
    for vid, v in emb_rows:
        vn = np.asarray(v) / np.linalg.norm(v)
        sims.append((float(vn @ qn), vid))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in sims[:k]]


def test_cosine_topk_matches_numpy(spark, emb):
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    q = rows[0][1]
    got = [r.vec_id for r in SIM.cosine_topk(emb, q, k=10).collect()]
    exp = brute_force_topk(rows, q, 10)
    assert got == exp
    assert got[0] == rows[0][0]  # self is most similar


def test_knn_join(spark, emb):
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    queries = spark.createDataFrame(
        [(100, rows[5][1]), (200, rows[17][1])], "q_id long, embedding array<double>"
    )
    out = SIM.knn_join(emb, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.q_id, []).append((r.rn, r.vec_id))
    for qid, src in ((100, 5), (200, 17)):
        ids = [v for _, v in sorted(got[qid])]
        assert ids == brute_force_topk(rows, rows[src][1], 5)
        assert ids[0] == rows[src][0]


def test_lsh_ann_recall(spark, emb):
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    queries = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(8)], "q_id long, embedding array<double>"
    )
    # random embeddings are near-orthogonal (true top-5 cosine ~0.3), so
    # recall needs short codes + many tables: p_hit = 1-(1-(1-theta/pi)^4)^12
    out = SIM.lsh_bucket_ann(emb, queries, k=5, n_bits=4, n_tables=12)
    got = {}
    for r in out.collect():
        got.setdefault(r.q_id, []).append((r.rn, r.vec_id))
    hits = total = 0
    for qid in range(8):
        exact = set(brute_force_topk(rows, rows[qid][1], 5))
        approx = {v for _, v in got.get(qid, [])}
        hits += len(exact & approx)
        total += 5
    assert hits / total >= 0.5  # recall@5
    # the query vector itself must always be found (identical buckets)
    for qid in range(8):
        assert any(v == rows[qid][0] for _, v in got[qid])


def test_ivf_search(spark, emb):
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    cents = SIM.train_centroids(emb, n_centroids=8, sample=256, iters=4)
    assert cents.shape[0] == 8
    # id_col is explicit, not positional: a frame with the vector column
    # first must train the same centroids
    shuffled = emb.select("embedding", "label", "vec_id")
    cents2 = SIM.train_centroids(shuffled, n_centroids=8, sample=256, iters=4)
    assert np.allclose(cents, cents2)
    fact = SIM.ivf_assign(emb, cents)
    ncells = fact.select("ivf_cell").distinct().count()
    assert ncells >= 4  # centroids actually spread
    queries = spark.createDataFrame(
        [(1, rows[3][1])], "q_id long, embedding array<double>"
    )
    out = SIM.ivf_search(fact, queries, cents, k=5, n_probe=4).collect()
    ids = [r.vec_id for r in sorted(out, key=lambda r: r.rn)]
    assert ids[0] == rows[3][0]  # self found
    exact = set(brute_force_topk(rows, rows[3][1], 5))
    assert len(exact & set(ids)) >= 3


def test_embedding_near_dup_pairs(spark, emb):
    # plant near-duplicates: vec + tiny noise
    rows = [(r.vec_id, list(r.embedding)) for r in emb.limit(50).collect()]
    import numpy as np
    rng = np.random.default_rng(3)
    planted = []
    for vid, v in rows[:5]:
        noisy = (np.asarray(v) + rng.normal(0, 0.01, len(v))).tolist()
        planted.append((1000 + vid, noisy))
    df = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in rows + planted],
        "vec_id long, embedding array<double>",
    )
    out = SIM.embedding_near_dup_pairs(df, threshold=0.95)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    for vid, _ in rows[:5]:
        assert (vid, 1000 + vid) in got, vid
    # random pairs are near-orthogonal: no false accepts at 0.95
    assert all(b - a == 1000 for a, b in got)


def test_lsh_ann_battery_params_equal_exact(spark, emb):
    """Pins the lsh_ann oracle invariant: at the battery parameters
    (n_bits=4, n_tables=24) the LSH top-5 EQUALS exact brute-force top-5 for
    the 4 fixture queries — the CORRECTNESS gate compares them directly."""
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    out = SIM.lsh_bucket_ann(emb, queries, k=5, n_bits=4, n_tables=24)
    got = {}
    for r in out.collect():
        got.setdefault(r.q_id, []).append((r.rn, r.vec_id))
    by_id = dict(rows)
    for qid in range(4):
        exact = brute_force_topk(rows, by_id[qid], 5)
        assert [v for _, v in sorted(got[qid])] == exact, qid


def test_embedding_near_dup_battery_equals_brute_force(spark, emb):
    """Pins the embedding_near_dup oracle invariant: exact duplicates collide
    in every LSH table, and no non-planted pair clears threshold 0.99, so the
    LSH+verify pair set equals SQL brute force."""
    dups = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    base = emb.select("vec_id", "embedding").unionByName(dups)
    got = {(r.id_a, r.id_b) for r in
           SIM.embedding_near_dup_pairs(base, threshold=0.99).collect()}
    # the battery config (n_bits=12, r3 perf: 16x fewer spurious candidates)
    # must pin the same invariant
    got12 = {(r.id_a, r.id_b) for r in
             SIM.embedding_near_dup_pairs(base, threshold=0.99,
                                          n_bits=12).collect()}
    # numpy brute force over the same frame
    rows = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64)) for r in base.collect()]
    exact = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            c = float(a[1] @ b[1] / (np.linalg.norm(a[1]) * np.linalg.norm(b[1])))
            if c >= 0.99:
                exact.add((min(a[0], b[0]), max(a[0], b[0])))
    assert got == exact
    assert got12 == exact
    assert exact == {(v, v + 100000) for v in range(10)}  # only planted pairs


def test_embedding_near_dup_bucket_cap(spark):
    """max_bucket star-links degenerate buckets: 40 identical vectors form
    one dense bucket per table — with the cap below 40 the quadratic
    self-join never materializes, but every member still pairs with the
    min-id representative (connectivity preserved, ADVICE r2); with the cap
    above, all pairs emerge."""
    v = [float(x) for x in np.random.default_rng(7).normal(size=16)]
    df = spark.createDataFrame(
        [(i, v) for i in range(40)], "vec_id long, embedding array<double>")
    capped = SIM.embedding_near_dup_pairs(df, threshold=0.99, max_bucket=8)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(0, i) for i in range(1, 40)}  # star: one component, O(n)
    full = SIM.embedding_near_dup_pairs(df, threshold=0.99, max_bucket=64)
    assert full.count() == 40 * 39 // 2
