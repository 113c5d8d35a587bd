"""HTML outlink + metadata extraction, Column-only (SURVEY C6 —
``Links.cpp``/``XmlDoc`` link harvesting and title extraction [U][H]).

The crawl loop's link_graph fixtures model WHAT links exist; this
module is the missing HOW — turning fetched HTML text into (src, dst,
anchor) edges and per-doc metadata entirely with JVM regex/array ops
(no UDF, whole-stage codegen), mirrored verbatim in DuckDB oracles.

Pinned parse subset (documented deviations from a full HTML5 parser —
both engines run the SAME pins, so the oracle is exact):

  * anchors are ``<a ...href=["']...["']...>flat text</a>`` — lowercase
    tags, quoted hrefs, no nested markup inside the anchor (RE2 has no
    backreferences, so quote pairing is ``["']([^"']*)["']``);
  * URL resolution (RFC 3986 subset): absolute ``http(s)://`` kept,
    scheme matched case-insensitively (the canonicalizer downstream
    owns case folding);
    ``//host/...`` adopts the base scheme; ``/path`` joins the base
    origin; other relative paths join the base DIRECTORY; fragments,
    empty hrefs, and non-http schemes (``mailto:``, ``javascript:``)
    are dropped; no dot-segment normalization here (the canonicalizer
    owns that, `functions/urls.py`);
  * anchor text is the flat inner text, whitespace-squeezed.

Scale shape: pure per-row projections + one posexplode — no shuffle
until the caller aggregates; the (src, dst) distinct is the same
uniform-key dedup every link-graph build needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_A_HREF = "<a [^>]*href=[\"']([^\"']*)[\"'][^>]*>[^<]*</a>"
_A_TEXT = "<a [^>]*href=[\"'][^\"']*[\"'][^>]*>([^<]*)</a>"


def resolve_href(base: F.Column, href: F.Column) -> F.Column:
    """Pinned RFC 3986-subset resolution; NULL for dropped hrefs."""
    h = F.trim(href)
    scheme = F.regexp_extract(base, r"^(https?)://", 1)
    origin = F.regexp_extract(base, r"^(https?://[^/?#]+)", 1)
    path = F.regexp_extract(base, r"^https?://[^/?#]+([^?#]*)", 1)
    basedir = F.concat(
        origin,
        F.when(path == "", F.lit("/"))
         .otherwise(F.regexp_replace(path, "[^/]*$", "")))
    return (
        F.when((h == "") | h.startswith("#"), F.lit(None))
        .when(h.rlike("^(?i)https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), F.lit(None))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(basedir, h)))


def extract_links(docs: DataFrame, base_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """(src_url, dst_url, anchor) — one row per resolvable anchor,
    deduped on (src, dst) keeping the first anchor text in document
    order (pinned: min struct(pos, anchor))."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_A_HREF), 1)
    texts = F.regexp_extract_all(F.col(html_col), F.lit(_A_TEXT), 1)
    rows = (docs.select(F.col(base_col).alias("src_url"),
                        F.posexplode(hrefs).alias("pos", "href"),
                        texts.alias("_texts"))
            .withColumn("anchor", F.trim(F.regexp_replace(
                F.element_at("_texts", F.col("pos") + 1), r"\s+", " "))))
    resolved = rows.withColumn(
        "dst_url", resolve_href(F.col("src_url"), F.col("href")))
    return (resolved.where(F.col("dst_url").isNotNull())
            .groupBy("src_url", "dst_url")
            .agg(F.min(F.struct("pos", "anchor")).alias("_first"))
            .select("src_url", "dst_url", F.col("_first.anchor")
                    .alias("anchor")))


def extract_meta(docs: DataFrame, base_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """(url, title, meta_description, canonical_url) per document.

    ``canonical_url`` (``<link rel="canonical" href=...>``) is the
    crawl-side dedup signal the reference reads from the page itself
    [U][M]; resolved by the same pinned law, NULL when absent."""
    h = F.col(html_col)
    title = F.trim(F.regexp_replace(
        F.regexp_extract(h, "<title>([^<]*)</title>", 1), r"\s+", " "))
    desc = F.regexp_extract(
        h, "<meta name=\"description\" content=\"([^\"]*)\"", 1)
    canon_raw = F.regexp_extract(
        h, "<link rel=\"canonical\" href=\"([^\"]*)\"", 1)
    return docs.select(
        F.col(base_col).alias("url"),
        title.alias("title"),
        desc.alias("meta_description"),
        F.when(canon_raw == "", F.lit(None))
         .otherwise(resolve_href(F.col(base_col), canon_raw))
         .alias("canonical_url"))
