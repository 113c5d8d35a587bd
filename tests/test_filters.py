"""URL-filter compiler: Spark when-chain backend ≡ pure-Python backend."""

import pyspark.sql.functions as F

from gigaspark.operators.url_filters import (
    ASSIGN_FIELDS, apply_url_filters, eval_rules_py, parse_expression,
    rules_from_rows,
)

RULE_ROWS = [
    dict(rule_idx=0, expression="ismedia", priority=-3, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=0, harvest_links=False, force_delete=False),
    dict(rule_idx=1, expression="hopcount>=7", priority=-3, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=0, harvest_links=False, force_delete=False),
    dict(rule_idx=2, expression="urlmatch~=killme", priority=60, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=0, harvest_links=False, force_delete=True),
    dict(rule_idx=3, expression="isseed", priority=80, spider_freq_days=30.0,
         max_spiders_per_ip=2, same_ip_wait_ms=150, harvest_links=True, force_delete=False),
    dict(rule_idx=4, expression="iswww && hopcount>=2", priority=25, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=250, harvest_links=True, force_delete=False),
    dict(rule_idx=5, expression="tld==test", priority=10, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=0, harvest_links=False, force_delete=False),
    dict(rule_idx=6, expression="default", priority=55, spider_freq_days=30.0,
         max_spiders_per_ip=1, same_ip_wait_ms=100, harvest_links=True, force_delete=False),
]

ROWS = [
    dict(url="http://a.example/x.jpg", host="a.example", path="/x.jpg",
         hopcount=0, errorcount=0, is_seed=False),
    dict(url="http://a.example/killme/1", host="a.example", path="/killme/1",
         hopcount=1, errorcount=0, is_seed=False),
    dict(url="http://a.example/p/1", host="a.example", path="/p/1",
         hopcount=9, errorcount=0, is_seed=False),
    dict(url="http://a.example/p/1", host="a.example", path="/p/1",
         hopcount=0, errorcount=0, is_seed=True),
    dict(url="http://www.b.example/p/2", host="www.b.example", path="/p/2",
         hopcount=3, errorcount=0, is_seed=False),
    dict(url="http://c.test/p/3", host="c.test", path="/p/3",
         hopcount=1, errorcount=0, is_seed=False),
    dict(url="http://d.example/p/4", host="d.example", path="/p/4",
         hopcount=1, errorcount=0, is_seed=False),
]


def test_parse_expression_rejects_garbage():
    import pytest
    with pytest.raises(ValueError):
        parse_expression("frobnicate>=3")


def test_spark_matches_python(spark):
    rules = rules_from_rows(RULE_ROWS)
    df = spark.createDataFrame(ROWS)
    got = apply_url_filters(df, rules).collect()
    for r in got:
        row = {k: r[k] for k in ("url", "host", "path", "hopcount",
                                 "errorcount", "is_seed")}
        want = eval_rules_py(rules, row)
        for f in ASSIGN_FIELDS:
            assert r[f] == want[f], (row, f, r[f], want[f])
    # sanity: expected ufn assignments
    by = {(r["url"], r["is_seed"]): r["ufn"] for r in got}
    assert by[("http://a.example/x.jpg", False)] == 0
    assert by[("http://a.example/killme/1", False)] == 2
    assert by[("http://a.example/p/1", False)] == 1   # hop 9
    assert by[("http://a.example/p/1", True)] == 3    # seed
    assert by[("http://www.b.example/p/2", False)] == 4
    assert by[("http://c.test/p/3", False)] == 5
    assert by[("http://d.example/p/4", False)] == 6


# --- F4 link-spam (round 2) --------------------------------------------------

SPAM_CASES = {
    # (host, path, query) → expected
    ("a.b.c.d.e.f.spam.example", "/p/1", ""): True,      # subdomain farm
    ("h.example", "/p/loop/loop/loop/9", ""): True,      # crawler trap
    ("h.example", "/great-casino-deals/3", ""): True,    # spam word
    ("h.example", "/a/b/c/d/e/f/g/h/i/j/k/l/m/0", ""): True,  # deep path
    ("h.example", "/p/7", "?" + "&".join(f"k{i}=1" for i in range(10))): True,
    ("h.example", "/" + "x" * 170, ""): True,            # long path
    ("h.example", "/p/9", ""): False,
    ("www.h.example", "/a/b/a/b", "?x=1&y=2"): False,    # non-consecutive
    ("h.example", "/loop/loop/p", ""): False,            # only 2 repeats
}


def test_py_link_spam_cases():
    from gigaspark.operators.url_filters import py_link_spam
    for (host, path, q), want in SPAM_CASES.items():
        url = f"http://{host}{path}{q}"
        assert py_link_spam(host, path, url) is want, (host, path, q)


def test_link_spam_col_matches_py(spark):
    from pyspark.sql import functions as F
    from gigaspark.operators.url_filters import link_spam_col, py_link_spam
    rows = [(h, p, f"http://{h}{p}{q}") for (h, p, q) in SPAM_CASES]
    df = spark.createDataFrame(rows, "host string, path string, url string")
    got = df.select("host", "path", "url",
                    link_spam_col(F.col("host"), F.col("path"),
                                  F.col("url")).alias("s")).collect()
    for r in got:
        assert r["s"] == py_link_spam(r["host"], r["path"], r["url"]), r["url"]


def test_islinkspam_predicate_in_chain(spark):
    """islinkspam rule drops spam rows before clean default rule."""
    from pyspark.sql import functions as F
    from gigaspark.operators.url_filters import apply_url_filters, rules_from_rows
    rules = rules_from_rows([
        {"rule_idx": 0, "expression": "islinkspam", "priority": -3,
         "spider_freq_days": 0.0, "max_spiders_per_ip": 1,
         "same_ip_wait_ms": 0, "harvest_links": False, "force_delete": False},
        {"rule_idx": 1, "expression": "default", "priority": 50,
         "spider_freq_days": 0.0, "max_spiders_per_ip": 1,
         "same_ip_wait_ms": 0, "harvest_links": True, "force_delete": False},
    ])
    rows = [(h, p, f"http://{h}{p}{q}") for (h, p, q) in SPAM_CASES]
    df = spark.createDataFrame(rows, "host string, path string, url string")
    out = apply_url_filters(df, rules).collect()
    from gigaspark.operators.url_filters import py_link_spam
    for r in out:
        spam = py_link_spam(r["host"], r["path"], r["url"])
        assert (r["priority"] < 0) == spam, r["url"]


def test_insitelist_predicate_both_backends(spark):
    from gigaspark.operators.url_filters import (
        apply_url_filters, eval_rules_py, rules_from_rows)

    rows = [
        {"rule_idx": 0, "expression": "insitelist==good.com|nice.org",
         "priority": 80, "spider_freq_days": 7.0, "max_spiders_per_ip": 4,
         "same_ip_wait_ms": 100, "harvest_links": True, "force_delete": False},
        {"rule_idx": 1, "expression": "default", "priority": -3,
         "spider_freq_days": 30.0, "max_spiders_per_ip": 1,
         "same_ip_wait_ms": 0, "harvest_links": False, "force_delete": False},
    ]
    rules = rules_from_rows(rows)
    cases = [
        ("good.com", 80),            # exact host
        ("www.good.com", 80),        # subdomain
        ("a.b.nice.org", 80),        # deep subdomain
        ("evilgood.com", -3),        # suffix WITHOUT dot boundary
        ("good.com.evil.net", -3),   # list entry not at the end
        ("other.net", -3),
    ]
    df = spark.createDataFrame(
        [(f"http://{h}/p", h, "/p", 0, 0, False) for h, _ in cases],
        "url string, host string, path string, hopcount int,"
        " errorcount int, is_seed boolean")
    got = {r["host"]: r["priority"] for r in apply_url_filters(df, rules).collect()}
    for h, want in cases:
        assert got[h] == want, h
        row = {"url": f"http://{h}/p", "host": h, "path": "/p",
               "hopcount": 0, "errorcount": 0, "is_seed": False}
        assert eval_rules_py(rules, row)["priority"] == want, h


def test_trap_templates_planted(spark):
    """Calendar trap flagged; static page and tiny variable template not."""
    from gigaspark.operators.url_filters import trap_templates

    rows = ([(f"http://a.example/cal/{m}/{d}",) for m in range(1, 6)
             for d in range(1, 6)]                        # 25 urls, one tpl
            + [("http://a.example/about",)] * 3           # static (deduped)
            + [(f"http://b.example/p/{i}",) for i in range(3)])  # small
    urls = spark.createDataFrame(rows, "url string").distinct()
    got = {(r["host"], r["template"]): (r["n_urls"], r["is_trap"])
           for r in trap_templates(urls, min_urls=10).collect()}
    assert got[("a.example", "/cal/*/*")] == (25, True)
    assert got[("a.example", "/about")] == (1, False)
    assert got[("b.example", "/p/*")] == (3, False)


def test_trap_templates_depth_cap(spark):
    """Segments past max_depth are ignored — deep trap collapses to one
    capped template."""
    from gigaspark.operators.url_filters import trap_templates

    rows = [(f"http://c.example/a/b/c/d/e/f/{i}/{j}",)
            for i in range(4) for j in range(4)]
    urls = spark.createDataFrame(rows, "url string")
    got = trap_templates(urls, min_urls=10, max_depth=6).collect()
    assert len(got) == 1
    r = got[0]
    assert r["template"] == "/a/b/c/d/e/f" and r["depth"] == 6
    # 16 distinct URLs but the capped template is static → not a trap
    assert r["n_urls"] == 16 and not r["is_trap"]
