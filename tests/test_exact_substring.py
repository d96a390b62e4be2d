"""Exact-substring (repeated-span) dedup — operators/exact_substring.py.

Checked against an independent plain-python reimplementation (dict of
gram occurrences -> rank -> interval merge), including a randomized
corpus sweep.
"""
import random

import pytest
from pyspark.sql import functions as F

from imagery_utils_spark.operators.exact_substring import (
    duplicated_windows, mask_repeated_spans, repeated_spans)


def _py_spans(corpus: dict[int, str], k: int):
    """Independent oracle: gram dict -> keep-first -> merge intervals."""
    occ: dict[tuple, list] = {}
    toks = {d: t.split() for d, t in corpus.items()}
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - k + 1):
            occ.setdefault(tuple(t[p:p + k]), []).append((d, p))
    dup = sorted(pos for lst in occ.values() for pos in sorted(lst)[1:])
    spans: dict[int, list] = {}
    for d, p in dup:
        cur = spans.setdefault(d, [])
        if cur and p <= cur[-1][1]:
            cur[-1][1] = max(cur[-1][1], p + k)
            cur[-1][2] += 1
        else:
            cur.append([p, p + k, 1])
    return {d: [(s, e, n) for s, e, n in v] for d, v in spans.items()}


def _spark_spans(spark, corpus, k, **kw):
    docs = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    rows = repeated_spans(docs, k=k, **kw).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.span_start)):
        out.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_windows))
    return out


CORPUS = {
    1: "the quick brown fox jumps over the lazy dog tonight",
    2: "intro text then the quick brown fox jumps over the lazy dog tonight and more",
    3: "totally unrelated words that never repeat anywhere else here",
    4: "self repeat self repeat self repeat self repeat self repeat self",
}


def test_keep_first_and_span_merge(spark):
    got = _spark_spans(spark, CORPUS, k=5)
    want = _py_spans(CORPUS, k=5)
    assert got == want
    # doc 1 is the corpus-wide first occurrence -> survives untouched
    assert 1 not in got and 3 not in got
    # doc 2's copy of the 10-token passage = one merged maximal span
    (s, e, n) = got[2][0]
    assert e - s == 10 and n == 6
    # doc 4 self-repeat: later windows of the period-2 repetition flagged
    assert 4 in got


def test_hash_path_matches_exact_path(spark):
    assert _spark_spans(spark, CORPUS, k=5, hash_grams=True) \
        == _spark_spans(spark, CORPUS, k=5)


def test_count_cap_drops_boilerplate(spark):
    corpus = {i: "COPYRIGHT NOTICE ALL RIGHTS RESERVED HERE unique%d page" % i
              for i in range(10)}
    capped = _spark_spans(spark, corpus, k=5, count_cap=5)
    uncapped = _spark_spans(spark, corpus, k=5)
    assert capped == {}                      # gram df=10 > cap -> exempt
    assert len(uncapped) == 9                # keep-first flags docs 1..9


def test_mask_repeated_spans(spark):
    docs = spark.createDataFrame(list(CORPUS.items()),
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in mask_repeated_spans(docs, k=5).collect()}
    spans = _py_spans(CORPUS, k=5)
    for d, text in CORPUS.items():
        t = text.split()
        drop = {i for s, e, _ in spans.get(d, []) for i in range(s, e)}
        want = " ".join(tok for i, tok in enumerate(t) if i not in drop)
        assert out[d].clean_text == want, d
        assert out[d].n_removed_tokens == len(drop)
    assert out[3].clean_text == CORPUS[3]    # untouched passthrough


def test_short_docs_skipped(spark):
    docs = spark.createDataFrame([(1, "a b c"), (2, "a b c")],
                                 "doc_id long, text string")
    assert repeated_spans(docs, k=5).count() == 0
    dup = duplicated_windows(docs, k=3).collect()
    assert [(r.doc_id, r.pos) for r in dup] == [(2, 0)]


def test_randomized_vs_python_oracle(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    corpus = {}
    for d in range(12):
        n = rng.randrange(0, 40)
        corpus[d] = " ".join(rng.choice(vocab) for _ in range(n))
    # inject a shared passage into a few docs to guarantee cross-doc dups
    shared = "alpha beta gamma delta epsilon zeta eta"
    for d in (2, 5, 9):
        corpus[d] = corpus[d] + " " + shared
    for k in (3, 4, 6):
        assert _spark_spans(spark, corpus, k=k) == _py_spans(corpus, k=k), k
