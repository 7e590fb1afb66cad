"""RFC 9309 robots.txt operator tests: group selection, wildcard and
anchor patterns, longest-match precedence, Allow tie-break, missing
robots, plan shape."""

import pytest

from pyspark.sql import functions as F

from kafka_delta_ingest_spark.operators.robots import (
    parse_robots,
    robots_filter,
    robots_rules,
)

_TXT = """
# crawl policy
User-agent: googlebot
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /admin
Disallow: /tmp/*.bak$
Allow: /admin/public
Disallow:
"""


def test_group_selection_and_parsing():
    star = parse_robots(_TXT)
    assert len(star) == 3  # empty Disallow dropped
    goog = parse_robots(_TXT, agent="Googlebot/2.1 (+http://...)")
    assert len(goog) == 2
    assert any(a for a, _, _ in goog)  # the Allow line
    # unparseable noise tolerated
    assert parse_robots("garbage\nno colon line\n::\n") == []
    assert parse_robots(None) == []


def test_pattern_compilation_wildcards_and_anchor():
    rules = {rx: (allow, spec) for allow, rx, spec in parse_robots(_TXT)}
    assert "^/admin" in rules
    wild = [rx for rx in rules if ".bak" in rx][0]
    assert wild.startswith("^/tmp/") and wild.endswith("\\.bak$")
    assert ".*" in wild


def test_verdicts_longest_match_allow_wins(spark):
    rdf = robots_rules(
        spark.createDataFrame(
            [("a.com", _TXT), ("b.com", "User-agent: *\nDisallow: /")],
            "host string, robots_txt string",
        )
    )
    pages = spark.createDataFrame(
        [
            ("a.com", "/index.html", True),
            ("a.com", "/admin/secret", False),
            ("a.com", "/admin/public/x", True),  # longer Allow wins
            ("a.com", "/tmp/f.bak", False),      # wildcard + $ anchor
            ("a.com", "/tmp/f.bak.txt", True),   # $ anchor miss
            ("b.com", "/anything", False),       # Disallow: /
            ("c.com", "/x", True),               # no robots.txt
        ],
        "host string, path string, expect boolean",
    )
    got = robots_filter(
        pages, rdf, keep_denied=True
    ).collect()
    for r in got:
        assert r.robots_allowed == r.expect, (r.host, r.path)
    kept = robots_filter(pages, rdf).collect()
    assert all(r.expect for r in kept) and len(kept) == 4


def test_allow_wins_specificity_tie(spark):
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c"
    rdf = robots_rules(
        spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    )
    pages = spark.createDataFrame(
        [("h", "/a/b"), ("h", "/a/c")], "host string, path string"
    )
    flags = {
        r.path: r.robots_allowed
        for r in robots_filter(pages, rdf, keep_denied=True).collect()
    }
    assert flags == {"/a/b": False, "/a/c": True}


def test_page_side_plan_is_broadcast_join_no_udf(spark):
    rdf = robots_rules(
        spark.createDataFrame([("h", _TXT)], "host string, robots_txt string")
    )
    pages = spark.createDataFrame([("h", "/x")], "host string, path string")
    plan = (
        robots_filter(pages, rdf, keep_denied=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the only python stage is the per-host rule parse, not the pages
    assert plan.count("MapInPandas") == 1
