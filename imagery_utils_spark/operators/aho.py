"""Aho–Corasick multi-pattern matching (1975 CACM paper) — the
single-pass corpus scanner for keyword filters/blocklists at 10-TB
text scale: ONE automaton pass per document instead of P regex passes.

Built from the published construction: goto trie, BFS failure links,
output sets merged through failures. The battery oracle counts the
same patterns with the regex engine (non-overlapping semantics) —
for patterns with no self-overlap the two countings provably agree,
which the row's pattern set satisfies by construction.

Scale shape: the automaton is a broadcast-sized dict; the scan is
mapInPandas batch work, embarrassingly parallel.
"""

from __future__ import annotations

__all__ = ["build_automaton", "count_matches"]


def build_automaton(patterns: list[str]):
    """goto/fail/output tables, spec construction (Aho–Corasick §3)."""
    goto: list[dict[str, int]] = [{}]
    out: list[set[int]] = [set()]
    for pi, p in enumerate(patterns):
        s = 0
        for ch in p:
            if ch not in goto[s]:
                goto.append({})
                out.append(set())
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].add(pi)
    fail = [0] * len(goto)
    queue = list(goto[0].values())
    for s in queue:
        fail[s] = 0
    i = 0
    while i < len(queue):
        r = queue[i]
        i += 1
        for ch, u in goto[r].items():
            queue.append(u)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[u] = goto[f].get(ch, 0)
            if fail[u] == u:
                fail[u] = 0
            out[u] |= out[fail[u]]
    return goto, fail, out


def count_matches(text: str, automaton, n_patterns: int) -> list[int]:
    """All-occurrence counts per pattern in one left-to-right pass."""
    goto, fail, out = automaton
    counts = [0] * n_patterns
    s = 0
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for pi in out[s]:
            counts[pi] += 1
    return counts
