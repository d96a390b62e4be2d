"""Robots exclusion (RFC 9309) — the crawl-policy gate of a webtext
pipeline: parse per-host ``robots.txt`` bodies into rule tables, then
flag each page allowed/blocked for a given user agent.

Semantics implemented from the RFC (public):

* groups = one or more stacked ``User-agent`` lines followed by
  ``Allow``/``Disallow`` rules; rules before any User-agent are ignored;
  an empty ``Disallow:`` value is "allow all" (no rule emitted);
  ``#`` starts a comment;
* agent selection: a host's rules for the EXACT agent (case-insensitive)
  if any exist, else its ``*`` group;
* matching: a rule pattern matches against the BEGINNING of the path;
  ``*`` is a wildcard, a trailing ``$`` anchors the end;
* precedence: the most specific match wins (longest pattern in octets);
  on a specificity tie, ``Allow`` wins. No matching rule → allowed.

Scale shape: robots tables are host-cardinality (tiny next to the page
table) — the rule set broadcasts; the page table is scanned once, the
regex match runs JVM-side (patterns are pre-compiled to Java/RE2-safe
regexes at PARSE time, in the Arrow batch), and the winner pick is a
per-page window over only that page's matching rules (a handful of
rows — no skew surface).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_robots_text", "parse_robots", "robots_gate"]


def parse_robots_text(body: str) -> list[tuple[str, bool, str, str, int]]:
    """One robots.txt body -> [(agent, allow, pattern, regex, spec_len)].
    spec_len = pattern length in octets (the RFC's specificity measure)."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    for line in (body or "").splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if rules:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not agents or not val:
                continue
            rules.append((key == "allow", val))
    if agents:
        groups.append((agents, rules))
    out = []
    for ag, rs in groups:
        for a in ag:
            for allow, pat in rs:
                esc = re.escape(pat).replace(r"\*", ".*")
                if esc.endswith(r"\$"):
                    esc = esc[:-2] + "$"
                out.append((a, allow, pat, "^" + esc, len(pat)))
    return out


_RULE_SCHEMA_TAIL = [
    T.StructField("agent", T.StringType()),
    T.StructField("allow", T.BooleanType()),
    T.StructField("pattern", T.StringType()),
    T.StructField("regex", T.StringType()),
    T.StructField("spec_len", T.IntegerType()),
]


def parse_robots(df: DataFrame, body_col: str = "body",
                 host_col: str = "host") -> DataFrame:
    """Explode (host, robots-body) rows into the rule table
    (host, agent, allow, pattern, regex, spec_len) — Arrow-batched,
    partition-preserving."""
    host_field = df.schema[host_col]
    schema = T.StructType([host_field] + _RULE_SCHEMA_TAIL)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for rec in parse_robots_text(body):
                    rows.append((host, *rec))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(host_col, body_col).mapInPandas(run, schema=schema)


def robots_gate(pages: DataFrame, rules: DataFrame, agent: str,
                id_col: str = "doc_id", host_col: str = "host",
                path_col: str = "path", out: str = "allowed") -> DataFrame:
    """Add ``out`` (boolean) to ``pages``: RFC 9309 verdict for
    ``agent``. ``rules`` is a :func:`parse_robots` table (broadcast)."""
    a = agent.lower()
    exact = rules.filter(F.col("agent") == a)
    exact_hosts = exact.select(host_col).distinct()
    fallback = (rules.filter(F.col("agent") == "*")
                .join(exact_hosts, host_col, "left_anti"))
    applicable = exact.unionByName(fallback)
    m = (pages.select(id_col, host_col, path_col)
         .join(F.broadcast(applicable), host_col)
         .filter(F.expr(f"{path_col} rlike regex")))
    win = Window.partitionBy(id_col).orderBy(F.desc("spec_len"),
                                             F.desc("allow"))
    winner = (m.withColumn("_rn", F.row_number().over(win))
              .filter(F.col("_rn") == 1)
              .select(id_col, F.col("allow").alias("_verdict")))
    return (pages.join(winner, id_col, "left")
            .withColumn(out, F.coalesce("_verdict", F.lit(True)))
            .drop("_verdict"))
