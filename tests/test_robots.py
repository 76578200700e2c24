"""frontier_robots_filter vs CPython's urllib.robotparser — a genuine
two-implementation differential: every (host, candidate url) verdict
the relational plan produces must equal robotparser's can_fetch('*',
url) on the same robots.txt text (hosts without robots.txt default to
allow). Also pins coverage: the fixture archetypes make every verdict
class appear (denied-by-Disallow, allowed-by-earlier-Allow,
allow-list deny-rest, empty-Disallow shadowing, no-robots default)."""

from __future__ import annotations

import urllib.robotparser

import duckdb

from pdf_extractor_spark.queries.robots import (
    ROBOTS_FIXTURE,
    frontier_robots_filter,
)

SF = "unused"


def test_verdicts_match_robotparser(spark):
    robots = {
        host: txt
        for host, txt in duckdb.sql(
            f"SELECT host, robots_txt FROM '{ROBOTS_FIXTURE}'"
        ).fetchall()
    }
    parsers = {}
    for host, txt in robots.items():
        p = urllib.robotparser.RobotFileParser()
        p.parse(txt.splitlines())
        parsers[host] = p

    rows = frontier_robots_filter(spark, SF).collect()
    assert rows
    verdict_classes = set()
    for r in rows:
        if r["dst_host"] in parsers:
            want = parsers[r["dst_host"]].can_fetch("*", r["url"])
        else:
            want = True  # no robots.txt -> allow
        assert bool(r["allowed"]) == want, r
        verdict_classes.add(
            (r["dst_host"] in parsers, r["rule_typ"], r["allowed"])
        )
    # every archetype produced a decided candidate: denied and allowed
    # by explicit rules, and the no-robots default
    assert any(t == "disallow" and a == 0 for _, t, a in verdict_classes)
    assert any(t == "allow" and a == 1 for _, t, a in verdict_classes)
    assert any(not has for has, _, _ in verdict_classes)
    # both allowed and denied exist overall
    assert {r["allowed"] for r in rows} == {0, 1}


def test_rules_broadcast_and_first_match(spark):
    plan = frontier_robots_filter(spark, SF)._jdf.queryExecution(
    ).executedPlan().toString()
    # the rule attach compiles to a broadcast HASH join on dst_host
    # with the prefix test as the residual condition — better than a
    # nested-loop theta-join, and still no shuffle of the candidates
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
