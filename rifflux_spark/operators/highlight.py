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


def snippet_column(
    ast,
    texts: dict[str, str],
    col: str,
    open_mark: str,
    close_mark: str,
    ellipsis: str,
    n_tokens: int,
) -> str:
    """FTS5-style ``snippet()`` for one column: pick the best
    ``n_tokens`` window and highlight it (marking inside the window is
    exact highlight() parity).

    Window SELECTION is a quantified approximation of FTS5's: the rule
    below was fitted against SQLite on randomized corpora and
    reproduces FTS5's exact window in ≥90% of cases (pinned in
    tests/test_highlight_identity.py; FTS5's residual behavior around
    its sentence finder resists black-box reconstruction):

    - candidate windows per active instance at position ``io``: one
      anchored at ``io``, plus — when the enclosing sentence start
      ``jj`` (largest start ≤ io, token 0 counts) still covers io
      (``jj + n_tokens > io``) — one anchored at ``jj`` with a +20
      sentence bonus;
    - window score = 1000 per distinct unit present + 1 per extra
      instance; strictly-greater wins (ties keep the earliest);
    - an instance-anchored winner is re-centered to ``iFirst -
      (n_tokens - (iLast - iFirst)) // 2`` (iLast = exclusive end of
      the last instance in the scored window), clamped to
      ``[0, n_col - n_tokens]``; a sentence-anchored winner displays
      from the sentence start;
    - a column with at most ``n_tokens`` tokens renders whole, no
      ellipsis; otherwise truncated sides get the ellipsis string.
    """
    toks = {c: tokenize_with_offsets(texts[c] or "") for c in COLUMNS}
    col_tokens = {c: [t for t, _s, _e in toks[c]] for c in COLUMNS}
    units, inst, actives = _active_instances_per_unit(ast, col_tokens)
    spans_by_unit: list[list[tuple[int, int]]] = []
    for i in range(len(units)):
        if actives.get(i, False):
            spans_by_unit.append(sorted(inst[i].get(col, [])))
        else:
            spans_by_unit.append([])
    all_spans = sorted({s for lst in spans_by_unit for s in lst})
    text = texts[col] or ""
    offs = toks[col]
    n_col = len(offs)

    def render(start: int, end: int, lead_ell: bool, trail_ell: bool) -> str:
        spans = [
            (s, e)
            for lst in spans_by_unit
            for (s, e) in lst
            if s >= start and e < end
        ]
        spans = sorted(set(spans))
        merged: list[list[int]] = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        pieces: list[str] = [ellipsis] if lead_ell else []
        pos = offs[start][1] if n_col else 0
        for s_tok, e_tok in merged:
            pieces.append(text[pos : offs[s_tok][1]])
            pieces.append(open_mark)
            pieces.append(text[offs[s_tok][1] : offs[e_tok][2]])
            pieces.append(close_mark)
            pos = offs[e_tok][2]
        tail_char = offs[end - 1][2] if n_col else 0
        pieces.append(text[pos:tail_char])
        if trail_ell:
            pieces.append(ellipsis)
        return "".join(pieces)

    if n_col <= n_tokens:
        return render(0, n_col, False, False) if n_col else text
    if not all_spans:
        return render(0, n_tokens, False, True)

    # sentence starts: token 0 plus any token following .!? in the
    # ORIGINAL text (FTS5's sentence finder drives its window choice)
    sent_starts = [0]
    for ti in range(n_col - 1):
        prev_end = offs[ti][2]
        nxt_start = offs[ti + 1][1]
        between = text[prev_end:nxt_start]
        if any(ch in between for ch in ".!?"):
            sent_starts.append(ti + 1)

    def window_score(lo: int) -> tuple[int, int, int]:
        score = 0
        i_first = -1
        i_last = 0
        for u_spans in spans_by_unit:
            seen = False
            for s, e in u_spans:
                if lo <= s < lo + n_tokens:
                    score += 1 if seen else 1000
                    seen = True
                    if i_first < 0 or s < i_first:
                        i_first = s
                    i_last = max(i_last, e + 1)  # exclusive end
        return score, i_first, i_last

    best_score = -1
    start = 0
    for io, _ie in all_spans:
        jj = max((s for s in sent_starts if s <= io), default=None)
        cands: list[tuple[str, int]] = [("inst", io)]
        if jj is not None and jj + n_tokens > io:
            cands.append(("sent", jj))
        for kind, lo in cands:
            score, i_first, i_last = window_score(lo)
            if kind == "sent":
                score += 20
            if score > best_score:
                best_score = score
                if kind == "sent":
                    st = lo
                else:
                    st = i_first - (n_tokens - (i_last - i_first)) // 2
                start = max(0, min(st, n_col - n_tokens))
    end = start + n_tokens
    return render(start, end, start > 0, end < n_col)


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
