"""RFC 9309 robots.txt parsing + admission units."""

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import spark  # noqa: F401

ROBOTS = """\
# global group
User-agent: *
Disallow: /search
Allow: /search/about
Disallow: /*.gif$

User-agent: trainbot
User-agent: otherbot
Disallow: /no-train/
Allow:

Crawl-delay: 10
Unknown-directive: x
"""


def _rules(spark, content=ROBOTS, host="ex.com"):
    from aide_spark.operators.robots import parse_robots

    df = spark.createDataFrame([(host, content)], ["host", "content"])
    return parse_robots(df)


def test_parse_groups_and_patterns(spark):
    rows = _rules(spark).collect()
    by_agent = {}
    for r in rows:
        by_agent.setdefault(r["agent"], []).append((r["rule"], r["pattern"]))
    # two UA lines head ONE group: both agents get the same rule set
    assert sorted(by_agent["trainbot"]) == [("disallow", "/no-train/")]
    assert sorted(by_agent["otherbot"]) == [("disallow", "/no-train/")]
    assert sorted(by_agent["*"]) == [
        ("allow", "/search/about"),
        ("disallow", "/*.gif$"),
        ("disallow", "/search"),
    ]
    # empty Allow: dropped; unknown directives dropped
    regs = {r["pattern"]: r["pattern_regex"] for r in rows}
    assert regs["/*.gif$"] == r"^/.*\.gif$"
    assert regs["/search"] == "^/search"


def _allowed(spark, paths, agent):
    from aide_spark.operators.robots import robots_allowed

    urls = spark.createDataFrame(
        [("ex.com", p) for p in paths], ["host", "path"]
    )
    out = robots_allowed(urls, _rules(spark), agent=agent)
    return {r["path"]: r["allowed"] for r in out.collect()}


def test_star_group_precedence(spark):
    got = _allowed(
        spark,
        ["/search", "/search/about", "/search/q", "/img/x.gif", "/img/x.gifs", "/ok"],
        agent="unrelatedbot",
    )
    assert got == {
        "/search": False,
        "/search/about": True,   # allow is longer than /search
        "/search/q": False,
        "/img/x.gif": False,     # $-anchored wildcard
        "/img/x.gifs": True,     # anchor must NOT match a longer path
        "/ok": True,
    }


def test_exact_agent_shadows_star(spark):
    got = _allowed(spark, ["/no-train/x", "/search"], agent="TrainBot")
    # exact group applies; the * group's /search rule is ignored for it
    assert got == {"/no-train/x": False, "/search": True}


def test_unknown_host_allowed(spark):
    from aide_spark.operators.robots import robots_allowed

    urls = spark.createDataFrame([("nohost.com", "/anything")], ["host", "path"])
    out = robots_allowed(urls, _rules(spark), agent="trainbot").collect()
    assert out[0]["allowed"] is True


def test_allow_wins_equal_length(spark):
    content = "User-agent: *\nDisallow: /a/\nAllow: /a/\n"
    from aide_spark.operators.robots import robots_allowed

    urls = spark.createDataFrame([("ex.com", "/a/x")], ["host", "path"])
    out = robots_allowed(urls, _rules(spark, content), agent="*").collect()
    assert out[0]["allowed"] is True
