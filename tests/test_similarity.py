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
