"""FTS5-style prefix indexes (opt-in, ``EngineConfig.prefix_lengths``).

SQLite FTS5's ``prefix='2 3'`` option builds extra inverted indexes
whose "terms" are token prefixes, so a ``tok*`` query reads ONE merged
posting list instead of expanding against the vocabulary. Same design
here: for each configured length L, every term with ``len >= L``
contributes its postings to the synthetic term ``'\\x01' + term[:L]``
(the 0x01 marker is a tokenizer separator byte, so it can never collide
with a real term), with per-doc tf summed across the matching terms —
exactly the probed FTS5 prefix-unit semantics (tf = summed occurrences,
df = docs containing ANY matching term), so a prefix query's results
are bit-identical with or without the index (pinned in
tests/test_prefix_index.py).

Scale story: the marker postings ride the NORMAL posting pipeline —
same block codec, same (term_bucket, salt) layout, same pruned reads,
same tombstone/compaction path — and a prefix query's cost becomes
df-proportional like any term's, independent of vocabulary size (the
un-indexed fallback scans the vocabulary and is capped at
MAX_PREFIX_EXPANSION terms). Storage cost is ~one extra posting per
(doc, distinct-prefix) per configured length, the same trade FTS5
documents for its prefix indexes.

Stats hygiene: marker rows are appended to ``term_stats`` (they serve
routing estimates and df lookups) but are EXCLUDED from corpus stats —
``total_tokens``/``avgdl`` must reflect real tokens only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFIX_MARKER = "\x01"


def marker(prefix: str) -> str:
    return PREFIX_MARKER + prefix


def is_marker(term: str) -> bool:
    return term.startswith(PREFIX_MARKER)


def tail_match_terms(terms: list[str], prefix: str) -> list[str]:
    """The index terms serving a prefix tail: either the single marker
    term (prefix-indexed) or the vocabulary expansion."""
    m = marker(prefix)
    return [t for t in terms if t == m or (not is_marker(t) and t.startswith(prefix))]


def prefix_thin_postings(
    chunks: DataFrame, lengths: tuple[int, ...]
) -> DataFrame:
    """Derive thin ``(term, doc_ord, dl, tf)`` marker postings from the
    chunks table's stored token stream (space-joined string column
    ``tokens``), ready for the standard ``encode_postings`` path.

    One explode of the token stream covers every configured length
    (a token of length >= L yields its first-L-chars marker); per-doc
    tf sums collapse map-side in the groupBy's partial aggregate.
    """
    toks = chunks.select(
        "doc_ord",
        "dl",
        F.explode(F.split("tokens", " ")).alias("t"),
    ).filter(F.col("t") != "")
    frames = []
    for L in sorted(set(int(x) for x in lengths)):
        frames.append(
            toks.filter(F.length("t") >= L).select(
                F.concat(F.lit(PREFIX_MARKER), F.substring("t", 1, L)).alias(
                    "term"
                ),
                "doc_ord",
                "dl",
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return (
        out.groupBy("term", "doc_ord")
        .agg(F.first("dl").alias("dl"), F.count("*").cast("long").alias("tf"))
        .select("term", "doc_ord", "dl", "tf")
    )


def prefix_term_deltas(thin: DataFrame, sign: int = 1) -> DataFrame:
    """(term, d_df, d_cf) deltas for the marker rows — merged into
    term_stats with the same machinery as incremental stats."""
    s = F.lit(int(sign))
    return thin.groupBy("term").agg(
        (s * F.count("*")).cast("long").alias("d_df"),
        (s * F.sum("tf")).cast("long").alias("d_cf"),
    )
