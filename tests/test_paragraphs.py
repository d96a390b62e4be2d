"""Paragraph-level corpus dedup (operators/paragraphs.py) vs a plain-python
keep-first reference on a constructed corpus with cross-doc boilerplate."""

import hashlib

from imagery_utils_spark.operators.paragraphs import (
    dedup_paragraphs,
    paragraph_chunks,
)


def _ref(docs, chunk):
    """Plain-python keep-first paragraph dedup."""
    chunks = {}  # doc_id -> [para]
    for doc_id, text in docs:
        toks = [t for t in text.split() if t]
        paras = [" ".join(toks[i:i + chunk])
                 for i in range(0, len(toks), chunk)]
        if paras:
            chunks[doc_id] = paras
    seen = set()
    out = {}
    for doc_id in sorted(chunks):
        kept = []
        for p in chunks[doc_id]:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (" ".join(kept), len(chunks[doc_id]),
                       len(chunks[doc_id]) - len(kept))
    return out


def test_dedup_paragraphs_keep_first(spark):
    boiler = "accept all cookies to continue reading this site"
    docs = [
        (0, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (1, f"{boiler} iota kappa llama mu nu xi omicron pi"),
        (2, f"unique one two three four five six seven {boiler}"),
        (3, boiler),  # entirely duplicate -> empty clean text
        (4, ""),      # empty doc -> no paragraphs, absent from output
        (5, "short doc"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_paragraphs(sdf, chunk=8).collect()}
    ref = _ref(docs, 8)
    assert set(got) == set(ref)
    for doc_id, (clean, n_paras, n_removed) in ref.items():
        r = got[doc_id]
        assert r.clean_text == clean, doc_id
        assert r.n_paras == n_paras
        assert r.n_removed == n_removed
    # doc 3 fully removed but still present with empty clean text
    assert got[3].clean_text == ""
    assert got[3].n_removed == got[3].n_paras == 1
    sha = hashlib.sha256(b"").hexdigest()
    assert sha  # (documented: driver row hashes clean_text with sha256)


def test_paragraph_chunks_shapes(spark):
    sdf = spark.createDataFrame(
        [(7, "a b c d e f g h i j k")], "doc_id long, text string")
    rows = sorted(paragraph_chunks(sdf, chunk=4).collect(),
                  key=lambda r: r.para_idx)
    assert [r.para for r in rows] == ["a b c d", "e f g h", "i j k"]
    assert [r.para_idx for r in rows] == [0, 1, 2]
