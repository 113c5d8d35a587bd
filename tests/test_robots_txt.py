"""Raw robots.txt parsing: pinned RFC 9309 subset semantics."""

from __future__ import annotations

from gigaspark.operators.robots import (RobotsOracle, fixture_rows_from_parsed,
                                        parse_robots_txt)

TXT = """# header comment
Orphan-before-group: /dropped
User-Agent: *
Disallow: /cgi  # trailing comment
Allow: /cgi/ok

User-agent: GigablastOpenSource
User-agent: OtherBot
Crawl-Delay: 3
Disallow:
Sitemap: http://a.example/sm.xml
Disallow: /tail
"""


def _rows(spark, txt=TXT, host="a.example"):
    df = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    return {(r["user_agent"], r["rule_type"], r["value"])
            for r in parse_robots_txt(df).collect()}


def test_parse_semantics(spark):
    got = _rows(spark)
    assert ("*", "disallow", "/cgi") in got          # comment stripped
    assert ("*", "allow", "/cgi/ok") in got
    # multi-UA group: every directive fans out to both agents
    for ua in ("GigablastOpenSource", "OtherBot"):
        assert (ua, "crawl_delay", "3") in got
        assert (ua, "disallow", "") in got           # empty = allow all
        assert (ua, "disallow", "/tail") in got      # trailing rule binds
    # sitemap is global, not group-scoped
    assert ("", "sitemap", "http://a.example/sm.xml") in got
    # pre-group + unknown directives dropped
    assert not any("dropped" in v for _, _, v in got)
    assert not any(t == "orphan-before-group" for _, t, _ in got)


def test_parse_feeds_robots_index(spark):
    """Parsed text composes into the existing RobotsIndex fixture shape
    and the oracle evaluates it (end-to-end: text → rules → verdict)."""
    df = spark.createDataFrame([("a.example", TXT)],
                               "host string, robots_txt string")
    fixture = fixture_rows_from_parsed(parse_robots_txt(df)).collect()
    oracle = RobotsOracle([r.asDict() for r in fixture])
    # our UA's group: empty Disallow + /tail
    assert oracle.allowed("a.example", "/anything")
    assert not oracle.allowed("a.example", "/tail/page")
    assert oracle.crawl_delay_ms("a.example") == 3000
    # a host with only the * group falls back to it
    df2 = spark.createDataFrame(
        [("b.example", "User-agent: *\nDisallow: /x")],
        "host string, robots_txt string")
    fx2 = fixture_rows_from_parsed(parse_robots_txt(df2)).collect()
    o2 = RobotsOracle([r.asDict() for r in fx2])
    assert not o2.allowed("b.example", "/x/1")
    assert o2.allowed("b.example", "/y")
