"""Unit tests for the prefix-doubling suffix array, the order-free
Adler-32 closed form (pinned to CPython's zlib), and the Merkle
pair-reduce (pinned to a hashlib reference fold)."""

import hashlib
import random
import zlib


def _adler_closed_form(s: str) -> int:
    """The engine's order-free formula, in plain Python."""
    n = len(s)
    cs = [ord(ch) for ch in s]
    a = (1 + sum(cs)) % 65521
    b = (n + sum((n - i) * c for i, c in enumerate(cs))) % 65521
    return b * 65536 + a


def test_adler_closed_form_matches_zlib():
    rng = random.Random(5)
    samples = ["", "a", "Wikipedia",
               "the fast key order sort table scan merge"]
    for _ in range(40):
        k = rng.randrange(0, 300)
        samples.append("".join(chr(rng.randrange(32, 127))
                               for _ in range(k)))
    for s in samples:
        assert _adler_closed_form(s) == zlib.adler32(s.encode())


def test_merkle_reference_odd_rule():
    # 5 leaves exercises the duplicate-last rule twice: 5 -> 3 -> 2 -> 1
    hs = [hashlib.sha256(t.encode()).hexdigest()
          for t in ("a", "b", "c", "d", "e")]
    lv = 0
    while len(hs) > 1:
        hs = [hashlib.sha256(
            (hs[j] + (hs[j + 1] if j + 1 < len(hs) else hs[j]))
            .encode()).hexdigest() for j in range(0, len(hs), 2)]
        lv += 1
    assert lv == 3 and len(hs[0]) == 64


def test_suffix_array_prefix_doubling(spark):
    from imagery_utils_spark.operators.suffix import suffix_array

    rng = random.Random(9)
    texts = {0: "banana", 1: "mississippi", 2: "abracadabra",
             3: "aaaaaa", 4: "b"}
    for d in range(5, 10):
        texts[d] = "".join(rng.choice("abcd")
                           for _ in range(rng.randrange(1, 40)))
    rows = [(d, i, t[i]) for d, t in texts.items()
            for i in range(len(t))]
    df = spark.createDataFrame(rows, "doc_id long, i long, c string")
    got = {}
    for r in suffix_array(df, max_len=64).collect():
        got.setdefault(r.doc_id, {})[r.i] = r["rank"]
    for d, t in texts.items():
        sa = sorted(range(len(t)), key=lambda i: t[i:])
        assert got[d] == {i: rk + 1 for rk, i in enumerate(sa)}, d
