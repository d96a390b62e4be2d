"""BM25 retrieval + inverted index (operators/search.py) vs plain-python
references using the identical scoring formula."""

from imagery_utils_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
)

DOCS = [
    (0, "merge sort and hash join in the stream engine"),
    (1, "stream stream stream processing"),
    (2, "hash hash hash hash tables everywhere"),
    (3, "nothing relevant here at all"),
    (4, "merge of the century"),
    (5, "a very long document about many things that mentions merge "
        "once among twenty other words in this sentence right here ok"),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    toked = {i: t.lower().split() for i, t in docs}
    n = len(toked)
    total = sum(len(t) for t in toked.values())
    avgdl = total / n
    dfs = {w: sum(1 for t in toked.values() if w in t) for w in terms}
    out = {}
    for i, t in toked.items():
        score = 0.0
        hit = False
        for w in terms:
            tf = t.count(w)
            if tf:
                hit = True
            idf = ((n - dfs[w]) + 0.5) / (dfs[w] + 0.5)
            score = score + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (len(t) / avgdl)))
        if hit:
            out[i] = score
    return out


def test_bm25_matches_reference(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.score, r.rank)
           for r in bm25_topk(sdf, ["merge", "stream", "hash"],
                              k=10).collect()}
    ref = _ref_bm25(DOCS, ["merge", "stream", "hash"])
    assert set(got) == set(ref)  # doc 3 excluded
    for i, s in ref.items():
        assert got[i][0] == s, i  # bit-exact, same expression tree
    order = sorted(ref, key=lambda i: (-ref[i], i))
    assert [i for i, _ in sorted(got.items(),
                                 key=lambda kv: kv[1][1])] == order


def test_bm25_k_truncates(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = bm25_topk(sdf, ["merge"], k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in rows] == [1, 2]


def test_inverted_index(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = {r.term: r for r in build_inverted_index(sdf).collect()}
    assert idx["merge"].df == 3
    assert [(p.doc_id, p.tf) for p in idx["merge"].postings] == [
        (0, 1), (4, 1), (5, 1)]
    assert [(p.doc_id, p.tf) for p in idx["hash"].postings] == [
        (0, 1), (2, 4)]
