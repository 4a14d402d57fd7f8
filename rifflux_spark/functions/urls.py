"""URL canonicalization + canonical-URL dedup for web-crawl pipelines.

A crawl sees the same page under many spellings — scheme/host case,
``www.`` prefixes, default ports, tracking parameters (``utm_*``,
``fbclid``, ``gclid``, ``ref``), parameter order, trailing slashes,
fragments. Canonicalizing before dedup collapses these WITHOUT touching
content hashing, and is the standard first pass of a crawl-dedup
pipeline (cf. the URL normalization steps of CommonCrawl/C4-style
corpora). The reference indexes local file paths and only normalizes
separators (rifflux chunker.py path normalization: ``\\`` → ``/``); a
web-scale engine needs the full rule set.

Everything here is a pure Catalyst expression tree — regexp/array
built-ins only, no Python on the hot path, so the canonical key is
computed inside whole-stage codegen and the dedup is one shuffle on
that key.

Rules applied (in order):
1. trim; drop the ``#fragment``;
2. drop the scheme (``http://``/``https://``, case-insensitive);
3. lowercase the authority (host[:port]) — path case is preserved
   (RFC 3986 §6.2.2.1: scheme and host are case-insensitive, the path
   is not);
4. drop a leading ``www.`` and a default ``:80``/``:443`` port;
5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), sort the survivors (RFC 3986 §6.2.2: order is not
   significant for equivalence in practice for crawl dedup), drop the
   ``?`` when none survive;
6. drop trailing ``/`` runs from the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|fbclid|gclid|ref)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring for rules)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, "#.*$", "")            # 1. fragment
    u = F.regexp_replace(u, "(?i)^https?://", "")  # 2. scheme
    host = F.lower(F.regexp_extract(u, "^[^/?]*", 0))  # 3. authority
    rest = F.regexp_replace(u, "^[^/?]*", "")
    host = F.regexp_replace(host, r"^www\.", "")   # 4. www + default port
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_extract(rest, "^[^?]*", 0)
    qs = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    params = F.array_sort(                          # 5. tracking params
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    path = F.regexp_replace(path, "/+$", "")       # 6. trailing slash
    return F.concat(
        host,
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group rows by canonical URL: ``(canon_url, n_urls, keep_id)``
    where ``keep_id`` is the smallest id among the spellings — the row a
    crawl-dedup pass keeps. One hash shuffle on the canonical key; the
    key itself is codegen'd map-side."""
    return (
        df.select(F.col(id_col), canonical_url(url_col).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min(id_col).cast("long").alias("keep_id"),
        )
    )
