"""robots.txt (RFC 9309, Robots Exclusion Protocol) filtering — the
compliance gate of a web-crawl corpus pipeline, completing the funnel:
WARC → extract → robots filter → URL normalize → dedup → curate.

Two halves, split by where the work belongs:

* ``parse_robots`` / ``robots_rules`` — parse each host's robots.txt
  ONCE into a compiled rule table: the most-specific matching
  user-agent group's Allow/Disallow lines, each compiled to an
  anchored Java-regex (RFC wildcards: ``*`` → ``.*``, trailing ``$``
  anchor) with its specificity (decoded-pattern length — the RFC's
  longest-match ordinal). Parsing is a tiny per-host Python kernel in
  ``mapInPandas``; robots files are KBs and one-per-host, so this
  side is dimension-sized.
* ``robots_filter`` — the corpus-sized half is PURE column
  expressions: join pages to their host's rule array (dimension join —
  AQE broadcasts it), keep the rules whose regex matches the path
  (``regexp_like`` with a per-row pattern inside ``F.filter``), and
  take the RFC verdict: the longest-match rule decides, Allow winning
  specificity ties; no matching rule (or no robots.txt) means
  allowed. One ``array_max`` over ``struct(specificity, allow)`` IS
  that rule — no UDF touches the page stream.

Scale: the page side never shuffles (broadcast rules); per-page cost
is bounded by the host's rule count.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def _compile_pattern(path_pattern: str) -> tuple[str, int]:
    """REP path pattern → (anchored Java regex, specificity)."""
    anchored_end = path_pattern.endswith("$")
    body = path_pattern[:-1] if anchored_end else path_pattern
    parts = [re.escape(p) for p in body.split("*")]
    rx = "^" + ".*".join(parts) + ("$" if anchored_end else "")
    return rx, len(body)


def parse_robots(txt: str, agent: str = "*") -> list[tuple[bool, str, int]]:
    """robots.txt → [(allow, path_regex, specificity)] for the most
    specific user-agent group matching ``agent`` (falling back to the
    ``*`` group), per RFC 9309 group-selection rules. Unparseable
    lines are ignored (the RFC requires tolerance)."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    current_agents: list[str] = []
    seen_rule_since_agent = True
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule_since_agent:
                current_agents = []
                seen_rule_since_agent = False
            current_agents.append(val.lower())
            for a in current_agents:
                # register the group even if it gains no rules: a
                # matching agent-specific empty group must override '*'
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            seen_rule_since_agent = True
            if not current_agents:
                continue
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow everything
            for a in current_agents:
                groups.setdefault(a, []).append((key == "allow", val))
    agent = agent.lower()
    chosen = None
    # most specific matching agent token wins; '*' is the fallback
    best_len = -1
    for a, rules in groups.items():
        if a != "*" and a in agent and len(a) > best_len:
            chosen, best_len = rules, len(a)
    if chosen is None:
        chosen = groups.get("*", [])
    out = []
    for allow, pattern in chosen:
        rx, spec = _compile_pattern(pattern)
        out.append((allow, rx, spec))
    return out


def robots_rules(
    robots_df: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → (host, rules array<struct<allow, rx,
    spec>>). Tiny per-host kernel; the output is the dimension side
    of :func:`robots_filter`."""
    import pandas as pd

    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(host_col, robots_df.schema[host_col].dataType),
            StructField(
                "rules",
                ArrayType(
                    StructType(
                        [
                            StructField("allow", BooleanType()),
                            StructField("rx", StringType()),
                            StructField("spec", IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for host, txt in zip(pdf[host_col], pdf[txt_col]):
                rows.append((host, parse_robots(txt or "", agent)))
            yield pd.DataFrame(rows, columns=[host_col, "rules"])

    return robots_df.select(host_col, txt_col).mapInPandas(
        run, schema=schema
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    keep_denied: bool = False,
) -> DataFrame:
    """Apply the RFC 9309 verdict to a page stream: longest matching
    rule decides, Allow wins specificity ties, no rule (or no
    robots.txt for the host) allows. Adds ``robots_allowed``; drops
    denied rows unless ``keep_denied``. The page side stays a pure
    projection — the rules array arrives by dimension join."""
    joined = pages.join(F.broadcast(rules), host_col, "left")
    matched = F.filter(
        F.coalesce(
            F.col("rules"),
            F.array().cast(rules.schema["rules"].dataType),
        ),
        lambda r: F.regexp_like(F.col(path_col), r["rx"]),
    )
    best = F.array_max(
        F.transform(matched, lambda r: F.struct(r["spec"], r["allow"]))
    )
    verdict = F.coalesce(best["allow"], F.lit(True))
    out = joined.withColumn("robots_allowed", verdict).drop("rules")
    if keep_denied:
        return out
    return out.where(F.col("robots_allowed")).drop("robots_allowed")
