"""Index-side tokenizer with SQLite FTS5 ``unicode61 remove_diacritics 2``
parity.

The reference delegates tokenization to FTS5 (reference
src/rifflux/db/schema.sql:21-28, tokenizer spec ``unicode61
remove_diacritics 2``); to get rank-identical BM25 the rebuild re-implements
it from the published unicode61 semantics:

- token characters: codepoints whose Unicode general category starts with
  ``L`` (letters) or ``N`` (numbers), plus ``Co`` (private use); everything
  else — including ``_`` (Pc) — separates tokens;
- case folding: simple lowercase fold;
- ``remove_diacritics 2``: diacritics are stripped from token characters,
  including diacritics expressed as separate combining codepoints (category
  ``Mn``), which are removed without terminating the token.

Parity is verified byte-for-byte against a real SQLite FTS5 instance via the
``fts5vocab`` virtual table in tests/test_tokenizer_fts5_parity.py.

Query-side compilation mirrors reference
src/rifflux/db/sqlite_store.py:239-243 (``\\w+`` extraction, disjunctive
OR of quoted terms).
"""

from __future__ import annotations

import re
import sys
import unicodedata
from functools import lru_cache

import pandas as pd

# ASCII fast path: token chars in ASCII are exactly [0-9A-Za-z]
# ('_' is category Pc -> separator under unicode61 defaults).
_ASCII_TOKEN_RE = re.compile(r"[0-9a-z]+")

# translate-table twin of the regex: alnum → lowercase, everything else →
# space; `translate(...).split()` yields exactly the maximal [0-9a-z] runs
# _ASCII_TOKEN_RE.findall(text.lower()) does, ~2× faster (verified
# exhaustively over all ASCII inputs in tests).
_ASCII_FOLD_TBL = str.maketrans(
    {cp: (chr(cp).lower() if chr(cp).isalnum() else " ") for cp in range(128)}
)

# Query compilation regex — reference sqlite_store.py:240 (\w+ keeps '_').
_QUERY_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


try:
    from rifflux_spark.functions._fts5_table import EXCEPTIONS as _FTS5_EXCEPTIONS
except ImportError:  # table not generated yet (bootstrap)
    _FTS5_EXCEPTIONS: dict[int, str | None] = {}


def _rule_fold_char(ch: str) -> str:
    """Fold one non-ASCII codepoint: classify, lowercase, strip diacritics.

    Returns '' for combining marks (removed, no boundary), ' ' for
    separators, else the folded token character(s).
    """
    cat = unicodedata.category(ch)
    if cat == "Mn":  # combining mark: remove_diacritics 2 strips it
        return ""
    # Cn (unassigned): FTS5's Unicode-6.1-era table treats codepoints it
    # does not know as token characters (observed empirically), and many
    # codepoints assigned after 6.1 fall in that bucket.
    if cat == "Cn":
        return ch
    if not (cat[0] in ("L", "N") or cat == "Co"):
        return " "
    low = ch.lower()
    out = []
    for c in low:
        # Strip diacritics carried inside precomposed letters. Empirically
        # (probed against fts5vocab) FTS5's remove_diacritics table only
        # covers letters whose base character is ASCII Latin: 'ệ'→'e',
        # 'ḃ'→'b', but Greek 'ά' and Cyrillic 'й' stay precomposed.
        decomposed = unicodedata.normalize("NFD", c)
        kept = [d for d in decomposed if unicodedata.category(d) != "Mn"]
        if kept and all(d.isascii() for d in kept):
            out.append("".join(kept))
        else:
            out.append(c)
    return "".join(out)


@lru_cache(maxsize=None)
def _fold_char(ch: str) -> str:
    """Fold one non-ASCII codepoint exactly as FTS5 does.

    Rule-based fold (lowercase + Latin-base diacritic strip, combining
    marks removed) with the empirically-extracted exception table layered
    on top, so every codepoint matches the C implementation byte-for-byte.
    """
    cp = ord(ch)
    if cp in _FTS5_EXCEPTIONS:
        exc = _FTS5_EXCEPTIONS[cp]
        return " " if exc is None else exc
    return _rule_fold_char(ch)


def tokenize(text: str) -> list[str]:
    """Tokenize one string exactly as FTS5 unicode61 remove_diacritics 2."""
    if not text:
        return []
    if text.isascii():
        return text.translate(_ASCII_FOLD_TBL).split()
    folded = "".join(
        ch.lower() if ch.isascii() and ch.isalnum()
        else (" " if ch.isascii() else _fold_char(ch))
        for ch in text
    )
    # folded may reintroduce ASCII letters from stripped diacritics — safe
    return [t for t in folded.split() if t]


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Tokenize with original-text character spans: ``(token, start,
    end_exclusive)`` per token, same token stream as :func:`tokenize`
    (asserted in tests). Used by the FTS5-parity ``highlight()``
    implementation, whose marks land in the ORIGINAL text.

    Non-ASCII goes through the per-char fold: each original character
    contributes 0..n folded characters ('' for stripped combining
    marks, ' ' for separators), so a token's span runs from its first
    to its last CONTRIBUTING original character — zero-width marks
    inside a token stay inside the span, exactly where FTS5's
    byte-offset bookkeeping puts them.
    """
    if not text:
        return []
    if text.isascii():
        return [
            (m.group(0), m.start(), m.end())
            for m in _ASCII_TOKEN_RE.finditer(text.lower())
        ]
    out: list[tuple[str, int, int]] = []
    cur: list[str] = []
    start = -1
    last_contrib = -1
    for i, ch in enumerate(text):
        folded = (
            ch.lower()
            if ch.isascii() and ch.isalnum()
            else (" " if ch.isascii() else _fold_char(ch))
        )
        if folded == "":
            continue  # stripped combining mark: no boundary, no chars
        if folded.isspace():
            if cur:
                out.append(("".join(cur), start, last_contrib + 1))
                cur = []
            continue
        # a single folded char may expand ('ﬁ' → 'fi'); it can also
        # contain a separator from the exception table — split on it
        parts = folded.split(" ")
        for pi, part in enumerate(parts):
            if pi > 0 and cur:
                out.append(("".join(cur), start, last_contrib + 1))
                cur = []
            if part:
                if not cur:
                    start = i
                cur.append(part)
                last_contrib = i
    if cur:
        out.append(("".join(cur), start, last_contrib + 1))
    return out


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized entry point used inside Arrow-batched pandas UDFs."""
    return texts.map(lambda t: tokenize(t) if isinstance(t, str) else [])


def compile_query(query: str) -> list[str]:
    """Query compilation — reference sqlite_store.py:239-243.

    Extracts ``\\w+`` runs; each run is then re-tokenized with the index
    tokenizer (FTS5 does this to quoted phrase text). A run containing an
    index-side separator (e.g. ``foo_bar``) expands to its sub-tokens;
    without positions stored we score it as the disjunction of sub-tokens
    (documented divergence: FTS5 treats it as a phrase — the reference
    query sets contain no such terms). Punctuation-only queries compile to
    [] and must return an empty result (reference
    tests/test_search_modes.py:146-156).
    """
    raw = [t for t in _QUERY_TOKEN_RE.findall(query) if t]
    out: list[str] = []
    for term in raw:
        out.extend(tokenize(term))
    return out


def _self_check() -> None:  # pragma: no cover
    assert tokenize("Hello, World_foo 42!") == ["hello", "world", "foo", "42"]
    assert tokenize("café Café") == ["cafe", "cafe"]


if "pytest" not in sys.modules:  # cheap import-time sanity in jobs
    _self_check()
