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
