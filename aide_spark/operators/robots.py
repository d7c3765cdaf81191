"""robots.txt parsing and URL admission — RFC 9309, columnar.

A crawl-scale training-data pipeline must honor robots exclusion before
a fetched page may enter the corpus. This implements the public RFC 9309
semantics as DataFrame algebra:

* **Parsing** (:func:`parse_robots`): lines → (group, agent, rule)
  rows. A *group* is one or more consecutive ``User-agent`` lines plus
  the ``Allow``/``Disallow`` lines that follow; a ``User-agent`` line
  after rules starts a new group. The grouping is a window running-sum
  over (host, line_no) — one shuffle keyed on host, balanced (each
  robots.txt is small by spec: 500 KiB cap).
* **Matching** (:func:`robots_allowed`): per (url, rule) candidate join
  on host, path-prefix match with RFC wildcards (``*`` → ``.*``,
  trailing ``$`` anchor) via ``regexp_like`` over a regex column
  compiled *columnarly* from the rule pattern, then the RFC precedence
  pick: longest pattern wins, ``allow`` wins length ties, no match ⇒
  allowed. The rules side is broadcast — robots tables are tiny
  relative to URL tables (one row per rule per host), so the admission
  check adds ZERO shuffle to the URL stream at 100 TB.

Agent selection follows the RFC: groups naming the product token
exactly (case-insensitive) apply when any exist for the host; otherwise
the ``*`` groups apply. Empty ``Disallow:`` lines (allow-everything
idiom) parse to no rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"^\s*([A-Za-z-]+)\s*:\s*([^#]*?)\s*(?:#.*)?$"


def parse_robots(robots: DataFrame) -> DataFrame:
    """(host, content) → one row per (host, agent, rule, pattern) with a
    pre-compiled ``pattern_regex`` and ``pattern_len`` for precedence.

    ``rule`` is 'allow' | 'disallow'. Unknown directives and empty
    disallow patterns are dropped (RFC 9309 §2.2.2: an empty pattern
    matches nothing).
    """
    lines = robots.select(
        "host",
        F.posexplode(F.split("content", r"\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("key"),
        F.regexp_extract("line", _DIRECTIVE_RE, 2).alias("value"),
    )
    lines = lines.where(F.col("key").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = (F.col("key") == "user-agent").cast("int")
    # two stages: lag first, then the running sum (Spark rejects a window
    # function nested inside another window expression)
    flagged = lines.select(
        "host", "line_no", "key", "value",
        is_ua.alias("is_ua"),
        F.lag(is_ua, 1, 0).over(w).alias("prev_ua"),
    )
    # a UA line NOT preceded by a UA line opens a new group
    grouped = flagged.select(
        "host",
        "line_no",
        "key",
        "value",
        F.sum(
            F.when((F.col("is_ua") == 1) & (F.col("prev_ua") == 0), F.lit(1))
            .otherwise(F.lit(0))
        )
        .over(w)
        .alias("group_id"),
    )
    agents = (
        grouped.where(F.col("key") == "user-agent")
        .select("host", "group_id", F.lower(F.trim("value")).alias("agent"))
        .distinct()
    )
    rules = grouped.where(
        (F.col("key") != "user-agent") & (F.trim("value") != "")
    ).select(
        "host",
        "group_id",
        F.col("key").alias("rule"),
        F.trim("value").alias("pattern"),
    )
    out = agents.join(rules, ["host", "group_id"]).drop("group_id")

    # compile the RFC pattern to a Java regex, columnarly: escape regex
    # metacharacters, '*' -> '.*', a trailing '$' -> the end anchor
    ends = F.col("pattern").endswith("$")
    body = F.when(
        ends, F.expr("substring(pattern, 1, length(pattern) - 1)")
    ).otherwise(F.col("pattern"))
    escaped = F.regexp_replace(body, r"([.\\+?\[\]()^{}|$])", r"\\$1")
    wild = F.regexp_replace(escaped, r"\*", ".*")
    regex = F.concat(
        F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )
    return out.select(
        "host",
        "agent",
        "rule",
        "pattern",
        regex.alias("pattern_regex"),
        F.length("pattern").cast("long").alias("pattern_len"),
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, agent: str = "*"
) -> DataFrame:
    """urls(host, path, …) + parsed rules → urls + ``allowed`` boolean.

    RFC 9309 precedence per URL: among matching rules of the applicable
    group set, the longest pattern wins and 'allow' beats 'disallow' on
    equal length; a URL matching no rule (or a host with no robots rows)
    is allowed.
    """
    agent = agent.lower()
    star = rules.where(F.col("agent") == "*")
    if agent != "*":
        exact = rules.where(F.col("agent") == agent)
        # a host with an exact-agent group ignores its * groups (RFC 9309 §2.2.1)
        star = star.join(exact.select("host").distinct(), "host", "left_anti")
        applicable = exact.unionByName(star)
    else:
        applicable = star
    applicable = applicable.select(
        "host", "rule", "pattern_regex", "pattern_len"
    )

    cand = urls.join(F.broadcast(applicable), "host", "left")
    hit = F.col("pattern_regex").isNotNull() & F.expr(
        "regexp_like(path, pattern_regex)"
    )
    # min(struct(-len, prio)): longest pattern, allow (prio 0) on ties
    pick = F.min(
        F.when(
            hit,
            F.struct(
                (-F.col("pattern_len")).alias("neg_len"),
                F.when(F.col("rule") == "allow", F.lit(0))
                .otherwise(F.lit(1))
                .alias("prio"),
            ),
        )
    )
    keys = [c for c in urls.columns]
    return (
        cand.groupBy(*keys)
        .agg(pick.alias("top"))
        .select(
            *keys,
            F.when(F.col("top").isNull(), F.lit(True))
            .otherwise(F.col("top.prio") == 0)
            .alias("allowed"),
        )
    )
