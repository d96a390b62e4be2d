"""Robots exclusion (operators/robots.py) vs RFC 9309 semantics."""
from imagery_utils_spark.operators.robots import (
    parse_robots_text, parse_robots, robots_gate)

BODY = """
# comment
User-agent: googlebot
User-agent: trainingbot
Disallow: /private/
Allow: /private/ok$

User-agent: *
Disallow: /tmp/*
Disallow:
Allow: /tmp/keep
"""


def test_parse_groups_and_wildcards():
    rules = parse_robots_text(BODY)
    agents = {r[0] for r in rules}
    assert agents == {"googlebot", "trainingbot", "*"}
    tb = [(r[1], r[2], r[3]) for r in rules if r[0] == "trainingbot"]
    assert (False, "/private/", "^/private/") in tb
    assert (True, "/private/ok$", "^/private/ok$") in tb
    star = [(r[1], r[2]) for r in rules if r[0] == "*"]
    # empty Disallow emits NO rule
    assert star == [(False, "/tmp/*"), (True, "/tmp/keep")]


def test_rules_before_user_agent_ignored():
    assert parse_robots_text("Disallow: /x\nUser-agent: *\nAllow: /a") == [
        ("*", True, "/a", "^/a", 2)]


def test_gate_semantics(spark):
    hosts = spark.createDataFrame([("h1", BODY), ("h2", "User-agent: *\n"
                                                        "Disallow: /")],
                                  "host string, body string")
    rules = parse_robots(hosts)
    pages = spark.createDataFrame([
        (0, "h1", "/private/secret"),       # trainingbot: disallow
        (1, "h1", "/private/ok"),           # $-anchored allow, longer: allow
        (2, "h1", "/private/okay"),         # $ does NOT match: disallow
        (3, "h1", "/tmp/x"),                # trainingbot group exists ->
                                            # '*' group NOT used: allowed
        (4, "h2", "/anything"),             # '*' disallow all
        (5, "h3", "/no/robots"),            # no rules: allowed
    ], "doc_id long, host string, path string")
    got = {r.doc_id: r.allowed
           for r in robots_gate(pages, rules, "TrainingBot").collect()}
    assert got == {0: False, 1: True, 2: False, 3: True, 4: False, 5: True}


def test_tie_allow_wins(spark):
    hosts = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /a/b\nAllow: /a/c")],
        "host string, body string")
    # same spec_len patterns matching different paths + a true tie
    hosts2 = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /a/*\nAllow: /a/b$")],
        "host string, body string")
    pages = spark.createDataFrame([(0, "h", "/a/b")],
                                  "doc_id long, host string, path string")
    r2 = parse_robots(hosts2)
    got = robots_gate(pages, r2, "x").collect()[0]
    # Allow '/a/b$' (len 6) beats Disallow '/a/*' (len 4)
    assert got.allowed
