"""Gopher quality rules (functions/quality.py) vs a plain-python
implementation of the pinned conventions."""
import re
from collections import Counter

from imagery_utils_spark.functions.quality import (
    GOPHER_STOPWORDS, gopher_quality)


def _py_metrics(text, min_words=50, max_words=100_000):
    w = [t for t in re.split(r"\s+", text) if t]
    n = len(w)
    sum_len = sum(len(x) for x in w)
    mwl = sum_len / n if n else 0.0
    n_hash = text.count("#")
    n_ellip = (len(text) - len(text.replace("...", ""))) // 3
    swr = (n_hash + n_ellip) / n if n else 0.0
    alpha = sum(1 for x in w if re.search("[a-zA-Z]", x)) / n if n else 0.0
    n_stop = len({x.lower() for x in w} & set(GOPHER_STOPWORDS))
    lines = [ln for ln in text.split("\n") if ln]
    lc = Counter(lines)
    n_lines = len(lines)
    dlf = (n_lines - len(lc)) / n_lines if n_lines else 0.0
    tot_chars = sum(c * len(ln) for ln, c in lc.items())
    dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
    dlcf = dup_chars / tot_chars if tot_chars else 0.0
    gc = Counter(zip(w, w[1:]))
    top2 = (max((c * (len(a) + len(b)) for (a, b), c in gc.items()),
                default=0) / sum_len) if sum_len else 0.0
    keep = (min_words <= n <= max_words and 3.0 <= mwl <= 10.0
            and swr <= 0.1 and alpha >= 0.8 and n_stop >= 2
            and dlf <= 0.30 and dlcf <= 0.20 and top2 <= 0.20)
    return (n, mwl, swr, alpha, n_stop, dlf, dlcf, top2, keep)


DOCS = [
    (0, "the cat sat on the mat\nwith a hat\nwith a hat\nand that rat"),
    (1, " ".join(["word"] * 60) + "\n" + " ".join(["word"] * 60)),
    (2, "### broken ... markup ### the of\nx y z"),
    (3, "to be or not to be that is the question with answers of many "
        + " ".join(f"tok{i}" for i in range(40))),
    (4, "solo"),
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r for r in
           gopher_quality(df, min_words=5, max_words=100).collect()}
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text in DOCS:
        n, mwl, swr, alpha, n_stop, dlf, dlcf, top2, keep = _py_metrics(
            text, min_words=5, max_words=100)
        r = got[doc_id]
        assert r.n_words == n, doc_id
        assert abs(r.mean_word_len - mwl) < 1e-12, doc_id
        assert abs(r.symbol_word_ratio - swr) < 1e-12, doc_id
        assert abs(r.frac_alpha_words - alpha) < 1e-12, doc_id
        assert r.n_stopwords == n_stop, doc_id
        assert abs(r.dup_line_frac - dlf) < 1e-12, doc_id
        assert abs(r.dup_line_char_frac - dlcf) < 1e-12, doc_id
        assert abs(r.top_2gram_char_frac - top2) < 1e-12, doc_id
        assert r.keep == keep, doc_id


def test_repetitive_doc_fails_keep(spark):
    df = spark.createDataFrame(
        [(0, ("spam ham " * 100).strip())], "doc_id long, text string")
    r = gopher_quality(df, min_words=5).collect()[0]
    assert r.top_2gram_char_frac > 0.2 and not r.keep
