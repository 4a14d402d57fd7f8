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
    """FTS5 ``snippet()`` for one column: pick the best ``n_tokens``
    window and highlight it (marking inside the window is exact
    highlight() parity).

    Window SELECTION is a from-scratch reimplementation of the
    algorithm in SQLite's public fts5_aux.c (fts5SnippetFunction /
    fts5SnippetScore / Fts5SFinder), replacing round-4's black-box
    fitted rule:

    - sentence starts = token 0, plus every token whose nearest
      preceding non-whitespace character is ``.`` or ``:``
      (fts5SentenceFinderCb);
    - instances are scanned in position order (xInst order); for each
      instance at ``io`` two candidates are scored with a fresh
      per-phrase ``aSeen``: the window anchored at ``io``, and — when
      the column is longer than the window and the enclosing sentence
      start ``jj`` (largest start, found by FTS5's scan loop) is
      STRICTLY before ``io`` — the window anchored at ``jj`` with a
      +120 bonus when ``jj == 0`` else +100;
    - window score = 1000 per distinct phrase present + 1 per extra
      instance (start offset inside the window; fts5SnippetScore);
      strictly-greater wins, so ties keep the earliest candidate;
    - an instance-anchored winner re-centers to ``iFirst - (nToken -
      (iLast - iFirst)) / 2`` with C truncating division (iFirst =
      first in-window instance start in scan order, iLast = exclusive
      end of the LAST in-window instance in scan order), clamped high
      then low; a sentence-anchored winner displays from the sentence
      start unadjusted;
    - a column with at most ``n_tokens`` tokens renders whole, no
      ellipsis; otherwise a truncated side gets the ellipsis string
      (trailing one iff ``start + n_tokens < column token count``).
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
        # instances STRADDLING a window edge are marked up to the edge
        # (fts5HighlightCb opens at iRangeStart for an instance already
        # in flight and closes at iRangeEnd for one still open)
        spans = [
            (max(s, start), min(e, end - 1))
            for lst in spans_by_unit
            for (s, e) in lst
            if s < end and e >= start
        ]
        spans = sorted(set(spans))
        merged: list[list[int]] = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        pieces: list[str] = [ellipsis] if lead_ell else []
        # a window touching a TEXT edge renders through it: FTS5 copies
        # from char 0 when iRangeStart==0 and to the end of the column
        # text once the range covers the last token (trailing
        # punctuation included — no ellipsis on that side)
        pos = (offs[start][1] if start > 0 else 0) if n_col else 0
        for s_tok, e_tok in merged:
            pieces.append(text[pos : offs[s_tok][1]])
            pieces.append(open_mark)
            pieces.append(text[offs[s_tok][1] : offs[e_tok][2]])
            pieces.append(close_mark)
            pos = offs[e_tok][2]
        tail_char = (offs[end - 1][2] if end < n_col else len(text)) if n_col else 0
        pieces.append(text[pos:tail_char])
        if trail_ell:
            pieces.append(ellipsis)
        return "".join(pieces)

    if n_col <= n_tokens:
        return render(0, n_col, False, False) if n_col else text
    if not all_spans:
        return render(0, n_tokens, False, True)

    # Fts5SFinder: token 0, plus every token whose nearest preceding
    # non-whitespace character in the original text is '.' or ':'
    sent_starts = [0]
    for ti in range(1, n_col):
        tok_start = offs[ti][1]
        c = ""
        for j in range(tok_start - 1, -1, -1):
            c = text[j]
            if not c.isspace():
                break
        if c in (".", ":"):
            sent_starts.append(ti)

    # xInst order: instances sorted by position (FTS5 surfaces them in
    # occurrence order); each carries its phrase (unit) index for aSeen
    xinst = sorted(
        (s, e, ui)
        for ui, lst in enumerate(spans_by_unit)
        for (s, e) in lst
    )

    def snippet_score(ipos: int) -> tuple[int, int, int]:
        """fts5SnippetScore: (score, iFirst, iLast) for the window
        [ipos, ipos + n_tokens). iFirst/iLast follow scan order."""
        score = 0
        i_first = -1
        i_last = 0
        seen: set[int] = set()
        for s, e, ui in xinst:
            if ipos <= s < ipos + n_tokens:
                score += 1 if ui in seen else 1000
                seen.add(ui)
                if i_first < 0:
                    i_first = s
                i_last = e + 1  # iOff + phrase size
        return score, i_first, i_last

    def cdiv2(x: int) -> int:
        return -((-x) // 2) if x < 0 else x // 2

    best_score = 0
    start = 0
    for io, _ie, _ui in xinst:
        # candidate 1: window anchored at the instance, re-centered
        score, i_first, i_last = snippet_score(io)
        if score > best_score:
            best_score = score
            i_adj = i_first - cdiv2(n_tokens - (i_last - i_first))
            if i_adj + n_tokens > n_col:
                i_adj = n_col - n_tokens
            if i_adj < 0:
                i_adj = 0
            start = i_adj
        # candidate 2: the enclosing sentence start (fts5SnippetFunction:
        # only when strictly before the instance; +120 bonus for a
        # document-leading sentence, +100 otherwise; no re-centering)
        if sent_starts and n_col > n_tokens:
            jj = 0
            while jj < len(sent_starts) - 1 and sent_starts[jj + 1] <= io:
                jj += 1
            sj = sent_starts[jj]
            if sj < io:
                score, _f, _l = snippet_score(sj)
                score += 120 if sj == 0 else 100
                if score > best_score:
                    best_score = score
                    start = sj
    end = min(start + n_tokens, n_col)
    return render(start, end, start > 0, start + n_tokens < n_col)


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
