"""Sitemap parsing + page metadata (operators/crawlmeta.py)."""

from aide_spark.operators.crawlmeta import extract_page_meta, parse_sitemap


def _docs(spark, rows, col):
    return spark.createDataFrame(rows, f"doc_id long, {col} string")


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      https://example.com/a
    </loc>
    <lastmod>2026-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.com/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""

SITEMAPINDEX = """<sitemapindex>
  <sitemap>
    <loc>https://example.com/sitemap-news.xml</loc>
    <lastmod>2026-02-01</lastmod>
  </sitemap>
</sitemapindex>"""


def test_urlset_entries_fields_and_whitespace(spark):
    out = sorted(
        parse_sitemap(_docs(spark, [(0, SITEMAP)], "xml")).collect(),
        key=lambda r: r["entry_idx"],
    )
    # the loc-less third entry is dropped (protocol requires <loc>)
    assert len(out) == 2
    assert out[0]["loc"] == "https://example.com/a"  # multi-line loc trimmed
    assert out[0]["lastmod"] == "2026-01-02"
    assert out[0]["changefreq"] == "daily"
    assert out[0]["priority"] == "0.8"
    assert out[1]["loc"] == "https://example.com/b"
    assert out[1]["lastmod"] == ""  # absent field -> ''
    assert all(r["kind"] == "url" for r in out)


def test_sitemapindex_children(spark):
    out = parse_sitemap(_docs(spark, [(0, SITEMAPINDEX)], "xml")).collect()
    assert len(out) == 1
    assert out[0]["kind"] == "sitemap"
    assert out[0]["loc"] == "https://example.com/sitemap-news.xml"
    assert out[0]["lastmod"] == "2026-02-01"


def test_empty_and_null_xml(spark):
    out = parse_sitemap(
        _docs(spark, [(0, ""), (1, None), (2, "<urlset></urlset>")], "xml")
    ).collect()
    assert out == []


HTML = """<html><head>
<title>
  A Long   Title
</title>
<meta property="og:title" content="The OG Title">
<meta content='og desc here' property='og:description'>
<meta name="description" content="plain desc">
<link href="https://example.com/canonical" rel="canonical">
</head><body></body></html>"""


def test_page_meta_both_orders_and_quotes(spark):
    out = extract_page_meta(_docs(spark, [(0, HTML)], "html")).collect()[0]
    assert out["title"] == "A Long   Title"
    assert out["og_title"] == "The OG Title"
    assert out["og_description"] == "og desc here"
    assert out["description"] == "plain desc"
    assert out["canonical"] == "https://example.com/canonical"
    assert out["og_image"] == ""


def test_page_meta_absent_fields_and_null(spark):
    rows = [(0, "<html><body>no head</body></html>"), (1, None)]
    out = {
        r["doc_id"]: r
        for r in extract_page_meta(_docs(spark, rows, "html")).collect()
    }
    assert len(out) == 2
    for r in out.values():
        assert r["title"] == "" and r["og_title"] == "" and r["canonical"] == ""


def test_page_meta_is_single_projection(spark):
    df = extract_page_meta(_docs(spark, [(0, HTML)], "html"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure per-row projection
