"""URL canonicalization + canonical-URL dedup (functions/urls)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rifflux_spark.functions.urls import canonical_url, url_dedup

CASES = [
    # (raw, canonical)
    ("https://example.com/a", "example.com/a"),
    ("HTTP://EXAMPLE.com/a", "example.com/a"),          # scheme/host case
    ("https://www.example.com/a", "example.com/a"),     # www
    ("https://example.com:443/a", "example.com/a"),     # default https port
    ("http://example.com:80/a", "example.com/a"),       # default http port
    ("https://example.com:8080/a", "example.com:8080/a"),  # real port kept
    ("https://example.com/a/", "example.com/a"),        # trailing slash
    ("https://example.com/a///", "example.com/a"),      # slash runs
    ("https://example.com/a#frag", "example.com/a"),    # fragment
    ("https://example.com/A/B", "example.com/A/B"),     # path case KEPT
    ("https://example.com/a?b=2&a=1", "example.com/a?a=1&b=2"),  # param sort
    ("https://example.com/a?utm_source=x", "example.com/a"),     # tracking only
    ("https://example.com/a?utm_source=x&k=1&fbclid=z", "example.com/a?k=1"),
    ("https://example.com/a?gclid=1&ref=rss", "example.com/a"),
    ("https://example.com/a/?b=2&utm_medium=m&a=1#x", "example.com/a?a=1&b=2"),
    ("  https://example.com/a  ", "example.com/a"),     # whitespace
    ("example.com/a", "example.com/a"),                 # already bare
    ("https://example.com", "example.com"),             # no path
    ("https://example.com/", "example.com"),
    # a param whose VALUE mentions a tracking name is kept (anchor is ^name=)
    ("https://example.com/a?q=utm_source", "example.com/a?q=utm_source"),
]


def test_canonical_url_rule_table(spark) -> None:
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["canon"]
        for r in df.select("doc_id", canonical_url("url").alias("canon")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_url_dedup_groups_spellings(spark) -> None:
    """Four spellings of one page collapse to one canonical key with the
    min doc_id kept; a different page stays separate."""
    rows = [
        (1, "https://www.Example.com/Page/7/?utm_source=a&b=2&a=1#top"),
        (2, "https://example.com/Page/7?a=1&b=2"),
        (3, "HTTP://EXAMPLE.COM:80/Page/7/?b=2&a=1"),
        (9, "https://example.com/Page/7?a=1&b=2&gclid=xyz"),
        (4, "https://example.com/Page/8?a=1&b=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canon_url"]: (r["n_urls"], r["keep_id"]) for r in url_dedup(df).collect()}
    assert out == {
        "example.com/Page/7?a=1&b=2": (4, 1),
        "example.com/Page/8?a=1&b=2": (1, 4),
    }


def test_canonical_url_is_codegen_expression(spark) -> None:
    """The canonical key is a pure Catalyst expression — the plan must
    contain no Python eval nodes (BatchEvalPython/ArrowEvalPython), so at
    100 TB the key computes inside whole-stage codegen map-side."""
    df = spark.createDataFrame([(1, "https://example.com/a")], "doc_id long, url string")
    plan = (
        df.select(canonical_url("url").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
