"""Crawl discovery & page metadata: sitemap parsing + OpenGraph extraction.

The crawl side of a web-scale pipeline needs two more columnar readers
next to robots.txt admission (operators/robots.py) and outlink
extraction (sources/html_codec.py):

* **Sitemaps** (sitemaps.org protocol, referenced by RFC 9309): the
  ``<urlset>`` / ``<sitemapindex>`` XML documents that seed and refresh
  the frontier. Machine-generated, rigidly regular — exactly the shape
  regexp extraction handles safely (no entity/attribute complexity
  inside ``<loc>``/``<lastmod>`` in practice).
* **Page-level metadata**: ``<title>``, OpenGraph ``og:*`` properties,
  ``<link rel=canonical>`` and ``<meta name=description>`` — the fields
  dedup pipelines use for canonical-URL collapse and corpus catalogs.

Everything is a single JVM projection per document:
``regexp_extract_all`` → ``posexplode`` → per-entry ``regexp_extract``.
Patterns are RE2-compatible (no lookaround, no backrefs) so the DuckDB
oracle runs the *same* expressions; both attribute orders
(``property=... content=...`` and ``content=... property=...``) and both
quote styles are matched with two patterns + ``coalesce`` instead of
lookahead. Full-DOM attribute parsing (unquoted values, entity-encoded
URLs) lives in the Python tokenizer (sources/html_codec.py) for the
span path; these extractors are the bulk-scan fast path.

Scale: linear per-document work, no join, no shuffle until whatever
aggregation the caller adds. The sitemap explode fans out ≤50k URLs per
sitemap (the protocol's own cap), spread across documents.

Reference scope: no crawl surface exists in the reference (its ingest is
a multipart upload handler, api/lambdas/upload/handler.py:101-182);
beyond-reference family (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Sitemaps
# --------------------------------------------------------------------------

_URL_ENTRY = r"(?is)<url\s*>(.*?)</url\s*>"
_SITEMAP_ENTRY = r"(?is)<sitemap\s*>(.*?)</sitemap\s*>"
_LOC = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"
_CHANGEFREQ = r"(?is)<changefreq\s*>\s*(.*?)\s*</changefreq\s*>"
_PRIORITY = r"(?is)<priority\s*>\s*(.*?)\s*</priority\s*>"


def _entries(xml: Column, pattern: str) -> Column:
    return F.regexp_extract_all(xml, F.lit(pattern), F.lit(1))


def parse_sitemap(
    docs: DataFrame, xml_col: str = "xml", id_col: str = "doc_id"
) -> DataFrame:
    """One row per sitemap entry:

    ``(id_col, entry_idx BIGINT, kind STRING, loc STRING,
    lastmod STRING, changefreq STRING, priority STRING)``

    ``kind`` is ``'url'`` for ``<urlset>`` entries and ``'sitemap'`` for
    ``<sitemapindex>`` children (the caller feeds those back into the
    fetch frontier). ``entry_idx`` numbers url and sitemap entries as one
    sequence in document order (urls first, then child sitemaps — each
    block keeps its own order). Empty fields surface as ``''`` — absent
    ``<lastmod>`` etc. stay distinguishable from whitespace-only via the
    trim inside the pattern. Entries with no ``<loc>`` are dropped (the
    protocol requires one).
    """
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    both = F.concat(
        F.transform(
            _entries(xml, _URL_ENTRY),
            lambda e: F.struct(F.lit("url").alias("kind"), e.alias("e")),
        ),
        F.transform(
            _entries(xml, _SITEMAP_ENTRY),
            lambda e: F.struct(F.lit("sitemap").alias("kind"), e.alias("e")),
        ),
    )
    exploded = docs.select(
        id_col, F.posexplode(both).alias("entry_idx", "ent")
    )
    e = F.col("ent")["e"]
    out = exploded.select(
        id_col,
        F.col("entry_idx").cast("long").alias("entry_idx"),
        F.col("ent")["kind"].alias("kind"),
        F.regexp_extract(e, _LOC, 1).alias("loc"),
        F.regexp_extract(e, _LASTMOD, 1).alias("lastmod"),
        F.regexp_extract(e, _CHANGEFREQ, 1).alias("changefreq"),
        F.regexp_extract(e, _PRIORITY, 1).alias("priority"),
    )
    return out.where(F.length("loc") > 0)


# --------------------------------------------------------------------------
# Page metadata (title / OpenGraph / canonical / description)
# --------------------------------------------------------------------------

_TITLE = r"(?is)<title[^>]*>\s*(.*?)\s*</title\s*>"


def _meta_patterns(attr: str, key: str, value_attr: str) -> tuple[str, str]:
    """(key-first, value-first) patterns for
    ``<meta {attr}="{key}" {value_attr}="...">`` in either attribute
    order and either quote style."""
    fwd = (
        rf"(?is)<meta\s+[^>]*{attr}\s*=\s*[\"']{key}[\"'][^>]*"
        rf"{value_attr}\s*=\s*[\"']([^\"']*)[\"']"
    )
    rev = (
        rf"(?is)<meta\s+[^>]*{value_attr}\s*=\s*[\"']([^\"']*)[\"'][^>]*"
        rf"{attr}\s*=\s*[\"']{key}[\"']"
    )
    return fwd, rev


_CANON_FWD = (
    r"(?is)<link\s+[^>]*rel\s*=\s*[\"']canonical[\"'][^>]*"
    r"href\s*=\s*[\"']([^\"']*)[\"']"
)
_CANON_REV = (
    r"(?is)<link\s+[^>]*href\s*=\s*[\"']([^\"']*)[\"'][^>]*"
    r"rel\s*=\s*[\"']canonical[\"']"
)


def _first_match(html: Column, fwd: str, rev: str) -> Column:
    return F.coalesce(
        F.nullif(F.regexp_extract(html, fwd, 1), F.lit("")),
        F.nullif(F.regexp_extract(html, rev, 1), F.lit("")),
        F.lit(""),
    )


# the fragments a DuckDB oracle mirrors 1:1 (same RE2 patterns)
META_FIELDS: dict[str, tuple[str, str]] = {
    "og_title": _meta_patterns("property", "og:title", "content"),
    "og_description": _meta_patterns("property", "og:description", "content"),
    "og_image": _meta_patterns("property", "og:image", "content"),
    "description": _meta_patterns("name", "description", "content"),
}


def extract_page_meta(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, title, og_title, og_description, og_image, description,
    canonical) — all STRING, ``''`` when absent. One projection, no
    shuffle; title is whitespace-trimmed, attribute values are taken
    verbatim (entity decoding belongs to the tokenizer path)."""
    html = F.coalesce(F.col(html_col), F.lit(""))
    cols = [
        F.trim(F.regexp_extract(html, _TITLE, 1)).alias("title"),
    ]
    for name, (fwd, rev) in META_FIELDS.items():
        cols.append(_first_match(html, fwd, rev).alias(name))
    cols.append(_first_match(html, _CANON_FWD, _CANON_REV).alias("canonical"))
    return docs.select(id_col, *cols)
