"""Bigram-LM integer-bits gate (operators/lm.py) vs a plain-python
reference with the identical Laplace-smoothed quantization."""

from collections import Counter

from imagery_utils_spark.operators.lm import bigram_rows, lm_bits_score

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "the dog ran"),
    (3, "zebra quokka axolotl wombat numbat"),  # unseen -> high bits
    (4, "the cat sat on the mat again"),
    (5, "single"),                               # < 2 tokens -> absent
]
REF_IDS = {0, 1, 2, 4}


def _fl2(x):
    return x.bit_length() - 1


def _ref(docs, ref_ids, threshold):
    toked = {i: t.lower().split() for i, t in docs}
    ref_bgs = [b for i in ref_ids for b in zip(toked[i], toked[i][1:])]
    c2 = Counter(ref_bgs)
    c1 = Counter(b[0] for b in ref_bgs)
    v = len({w for i in ref_ids for w in toked[i]})
    out = {}
    for i, toks in toked.items():
        bs = list(zip(toks, toks[1:]))
        if not bs:
            continue
        bits = sum(_fl2(c1.get(w1, 0) + v) - _fl2(c2.get((w1, w2), 0) + 1)
                   for w1, w2 in bs)
        bpt = bits / len(bs)
        out[i] = (bits, len(bs), bpt, bpt < threshold)
    return out


def test_lm_bits_matches_reference(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    ref_sdf = sdf.filter(sdf.doc_id.isin(*REF_IDS))
    got = {r.doc_id: (r.bits, r.n_bigrams, r.bits_per_token, r.keep)
           for r in lm_bits_score(sdf, ref_sdf, threshold=3.0).collect()}
    assert got == _ref(DOCS, REF_IDS, 3.0)
    assert 5 not in got                  # no bigrams, absent
    assert not got[3][3]                 # unseen-vocab doc rejected
    assert got[0][3] and got[4][3]       # in-reference docs kept


def test_lm_self_trained_default(spark):
    sdf = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.bits for r in lm_bits_score(sdf).collect()}
    ref = _ref(DOCS, set(range(6)), 9.0)
    assert got == {i: v[0] for i, v in ref.items()}


def test_bigram_rows(spark):
    sdf = spark.createDataFrame([(9, "A b a")], "doc_id long, text string")
    rows = bigram_rows(sdf).collect()
    assert sorted((r.w1, r.w2) for r in rows) == [("a", "b"), ("b", "a")]
