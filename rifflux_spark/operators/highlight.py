"""FTS5 ``highlight()`` parity: wrap the matched-and-ACTIVE instance
spans of a MATCH query in the original column text.

Semantics probed against SQLite FTS5 (tests/test_highlight_identity.py
pins them rank-for-rank on randomized queries):

- marks land at original-text character offsets (diacritics and
  punctuation preserved outside the marks);
- only instances the bm25 machinery counts are marked: instances of
  ACTIVE units (the ancestor-chain rule), NEAR-participating instances
  only, anchored instances only, and nothing from columns a filter
  excludes;
- instance token ranges that OVERLAP (share a token) merge into one
  mark; merely adjacent instances stay separate marks.

Driver-side over the final top-k rows only (k strings per query) — the
distributed plan is untouched.
"""

from __future__ import annotations

from rifflux_spark.functions.ftsparse import (
    COLUMNS,
    NearGroup,
    collect_units,
    leaf_groups,
    match_and_actives,
)
from rifflux_spark.functions.tokenizer import tokenize_with_offsets
from rifflux_spark.operators.ftsquery import near_participating, unit_instances


def _active_instances_per_unit(ast, col_tokens: dict[str, list[str]]):
    """Per leaf unit: {column: [instance (s, e)]} counting only what
    FTS5's instance API surfaces — NEAR-trimmed, per allowed column —
    plus the row-level active booleans from the ancestor-chain fold."""
    units = collect_units(ast)
    groups = leaf_groups(ast)
    inst: list[dict[str, list[tuple[int, int]]]] = []
    for u in units:
        allowed = u.cols or COLUMNS
        inst.append(
            {c: unit_instances(col_tokens[c], u) for c in allowed}
        )
    # NEAR groups: replace member instances with participating ones
    done: set[int] = set()
    for gi, g in enumerate(groups):
        if g is None or id(g) in done:
            continue
        done.add(id(g))
        idxs = [i for i, gg in enumerate(groups) if gg is g]
        allowed = units[idxs[0]].cols or COLUMNS
        per_col: dict[str, list[list[tuple[int, int]]]] = {}
        for c in allowed:
            lists = [inst[i].get(c, []) for i in idxs]
            per_col[c] = near_participating(lists, g.n)
        for j, i in enumerate(idxs):
            inst[i] = {c: per_col[c][j] for c in allowed}
    presence = [
        any(bool(v) for v in m.values()) for m in inst
    ]
    _match, actives = match_and_actives(ast, lambda i: presence[i])
    return units, inst, actives


def highlight_columns(
    ast,
    texts: dict[str, str],
    open_mark: str,
    close_mark: str,
) -> dict[str, str]:
    """Highlight every indexed column of one row for a parsed MATCH
    query; returns {column: marked_text}."""
    toks = {c: tokenize_with_offsets(texts[c] or "") for c in COLUMNS}
    col_tokens = {c: [t for t, _s, _e in toks[c]] for c in COLUMNS}
    units, inst, actives = _active_instances_per_unit(ast, col_tokens)
    out: dict[str, str] = {}
    for c in COLUMNS:
        spans: list[tuple[int, int]] = []
        for i in range(len(units)):
            if not actives.get(i, False):
                continue
            spans.extend(inst[i].get(c, []))
        if not spans:
            out[c] = texts[c]
            continue
        spans.sort()
        # merge token ranges that SHARE a token (overlap); adjacent
        # ranges stay separate (probed FTS5 behavior)
        merged: list[list[int]] = [list(spans[0])]
        for s, e in spans[1:]:
            if s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        text = texts[c]
        offs = toks[c]
        pieces: list[str] = []
        pos = 0
        for s_tok, e_tok in merged:
            s_char = offs[s_tok][1]
            e_char = offs[e_tok][2]
            pieces.append(text[pos:s_char])
            pieces.append(open_mark)
            pieces.append(text[s_char:e_char])
            pieces.append(close_mark)
            pos = e_char
        pieces.append(text[pos:])
        out[c] = "".join(pieces)
    return out
