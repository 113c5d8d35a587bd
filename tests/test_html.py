"""HTML link/metadata extraction: pinned resolution + dedup laws."""

from __future__ import annotations

from gigaspark.operators.html import extract_links, extract_meta


def _doc(spark, html, url="http://a.example/dir/page.html"):
    return spark.createDataFrame([(url, html)], "url string, html string")


def test_resolution_rules(spark):
    html = (
        '<a href="http://b.example/x">abs</a>'
        "<a href='/root'>rootrel</a>"
        '<a href="//cdn.example/c">proto</a>'
        '<a href="sub/d.html">rel</a>'
        '<a href="#top">frag</a>'
        '<a href="">empty</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="mailto:a@b.c">mail</a>')
    got = {r["dst_url"]: r["anchor"]
           for r in extract_links(_doc(spark, html)).collect()}
    assert got == {
        "http://b.example/x": "abs",
        "http://a.example/root": "rootrel",
        "http://cdn.example/c": "proto",
        "http://a.example/dir/sub/d.html": "rel",
    }


def test_dedup_keeps_first_anchor(spark):
    html = ('<a href="/x">first  text</a>'
            '<a href="/y">other</a>'
            '<a href="/x">second text</a>')
    rows = {r["dst_url"]: r["anchor"]
            for r in extract_links(_doc(spark, html)).collect()}
    assert rows["http://a.example/x"] == "first text"  # squeezed + first
    assert len(rows) == 2


def test_meta_and_canonical(spark):
    html = ("<title>  A   Title </title>"
            '<meta name="description" content="the desc">'
            '<link rel="canonical" href="/canon/1">')
    r = extract_meta(_doc(spark, html)).collect()[0]
    assert r["title"] == "A Title"
    assert r["meta_description"] == "the desc"
    assert r["canonical_url"] == "http://a.example/canon/1"
    r2 = extract_meta(_doc(spark, "<p>no head</p>")).collect()[0]
    assert r2["title"] == "" and r2["canonical_url"] is None


def test_base_without_path(spark):
    """Relative links against an origin-only base join at '/'."""
    got = extract_links(
        _doc(spark, '<a href="p.html">x</a>', url="http://a.example")
    ).collect()
    assert got[0]["dst_url"] == "http://a.example/p.html"


def test_uppercase_scheme_absolute_kept(spark):
    """HTTP:// (any case) is an absolute link, not an unknown scheme."""
    got = extract_links(
        _doc(spark, '<a href="HTTP://B.Example/X">up</a>')).collect()
    assert got[0]["dst_url"] == "HTTP://B.Example/X"
