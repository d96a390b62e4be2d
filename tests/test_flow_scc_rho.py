"""Plain-Python pins for the flow/SCC/rho battery rows: Edmonds–Karp
flow equals exhaustive min cut (the duality the oracle relies on),
closure-by-squaring equals stepwise closure, and doubling-derived
tail/cycle stats equal the literal walk."""

import random


def _edmonds_karp(edges, s, t):
    import collections
    cap = collections.defaultdict(int)
    adj = collections.defaultdict(set)
    for u, v, c in edges:
        cap[(u, v)] += c
        adj[u].add(v)
        adj[v].add(u)
    flow = 0
    while True:
        par = {s: -1}
        q = [s]
        while q and t not in par:
            x = q.pop(0)
            for y in sorted(adj[x]):
                if y not in par and cap[(x, y)] > 0:
                    par[y] = x
                    q.append(y)
        if t not in par:
            return flow
        path, y = [], t
        while par[y] != -1:
            path.append((par[y], y))
            y = par[y]
        b = min(cap[e] for e in path)
        for x, y in path:
            cap[(x, y)] -= b
            cap[(y, x)] += b
        flow += b


def test_flow_equals_min_cut():
    rng = random.Random(13)
    for _ in range(25):
        edges = [(u, u + 1, rng.randrange(1, 30)) for u in range(7)]
        for u in range(7):
            for v in range(u + 2, 8):
                if rng.random() < 0.4:
                    edges.append((u, v, rng.randrange(1, 30)))
        flow = _edmonds_karp(edges, 0, 7)
        best = None
        for m in range(64):
            side = {0} | {i for i in range(1, 7) if (m >> (i - 1)) & 1}
            cut = sum(c for u, v, c in edges
                      if u in side and v not in side)
            best = cut if best is None else min(best, cut)
        assert flow == best


def test_closure_squaring_equals_stepwise():
    rng = random.Random(2)
    V = 20
    for _ in range(10):
        e = {(v, rng.randrange(V)) for v in range(V)}
        e |= {(v, rng.randrange(V)) for v in range(V)}
        r = set(e) | {(v, v) for v in range(V)}
        for _ in range(5):  # squaring: paths up to 32 >= V
            r = r | {(a, d) for (a, b) in r for (c, d) in r if b == c}
        step = set(e) | {(v, v) for v in range(V)}
        while True:
            new = step | {(a, c) for (a, b) in step for (bb, c) in e
                          if b == bb}
            if new == step:
                break
            step = new
        assert r == step


def test_rho_walk_stats():
    rng = random.Random(8)
    V = 40
    f = {v: rng.randrange(V) for v in range(V)}
    for v0 in range(V):
        acc, cur = [v0], v0
        while f[cur] not in acc:
            cur = f[cur]
            acc.append(cur)
        entry = f[cur]
        pos = acc.index(entry)
        tail, cyc = pos, acc[pos:]
        # doubling-style facts: f^V(v0) is on the cycle; tail is the
        # distance to the first cycle node
        x = v0
        for _ in range(V):
            x = f[x]
        assert x in cyc
        assert tail == len(acc) - len(cyc)
        assert min(cyc) in cyc and len(cyc) >= 1
