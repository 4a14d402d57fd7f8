"""Reusable include/exclude glob filter (SURVEY §2 A2).

The reference filters crawl paths with fnmatch globs — included iff ANY
include glob matches and NO exclude glob does (reference
src/rifflux/indexing/indexer.py:29-61, config.py:30-31). Re-expressed as
Catalyst predicates so the filter pushes into the parquet/Iceberg scan:

- globs using only ``*``/``?`` compile to SQL ``LIKE`` patterns —
  Catalyst turns prefix patterns (``src1*`` → ``src1%``) into
  ``StartsWith``, which parquet row-group stats can prune on;
- globs with character classes (``[seq]``/``[!seq]``) fall back to
  ``regexp_like`` over ``fnmatch.translate`` — still JVM-side
  whole-stage codegen, just not stats-prunable.

fnmatch's ``*`` matches across ``/`` (unlike shell glob) — so does SQL
``%``; both sides agree by construction.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LIKE_SPECIALS = {"%", "_", "\\"}


def _glob_to_like(pattern: str) -> str | None:
    """Translate a glob to a LIKE pattern, or None if it needs regex
    (character classes)."""
    out: list[str] = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("[", "]"):
            return None
        elif ch in _LIKE_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def glob_predicate(col: Column | str, patterns: tuple[str, ...] | list[str]) -> Column:
    """True iff ANY pattern matches (fnmatch semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    if not patterns:
        return F.lit(False)
    preds: list[Column] = []
    for p in patterns:
        like = _glob_to_like(p)
        if like is not None:
            preds.append(c.like(like))
        else:
            preds.append(F.regexp_like(c, F.lit("\\A" + fnmatch.translate(p))))
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def glob_filter(
    df: DataFrame,
    col: str = "url",
    include: tuple[str, ...] | list[str] = ("*",),
    exclude: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Keep rows where ``col`` matches ≥1 include glob and 0 exclude
    globs — the reference's ``_is_included and not _is_excluded``."""
    pred = glob_predicate(col, tuple(include))
    if exclude:
        pred = pred & ~glob_predicate(col, tuple(exclude))
    return df.filter(pred)
