"""FTS5 MATCH query-language parser (the subset the engine executes).

Grammar — pinned empirically against SQLite FTS5 in
tests/test_fts_rank_identity.py (the published syntax diagram at
www.sqlite.org/fts5.html is looser than the implementation; every rule
below was probed against a real FTS5 table):

    query   :=  orexpr
    orexpr  :=  andexpr ( OR andexpr )*
    andexpr :=  primary ( (AND | NOT) primary )*   -- same level, left-assoc
    primary :=  '(' orexpr ')' | unitseq
    unitseq :=  unit+        -- juxtaposition = implicit AND, UNITS ONLY
    unit    :=  '"' tokens '"' ['*']  |  bareword ['*']

Notable FTS5 behaviors this reproduces:
- juxtaposition binds TIGHTER than NOT/AND ('a NOT b c' ≡ 'a NOT (b c)')
  and only joins phrase units — '(a) (b)' and 'a (b OR c)' are syntax
  errors in FTS5 and raise here;
- operators must be uppercase (lowercase ``and`` is a term);
- AND and NOT share one precedence level (left-associative), OR binds
  loosest;
- a bareword the index tokenizer splits ('foo_bar') becomes a phrase
  unit; a trailing ``*`` makes the unit's last token a prefix.

Column filters are supported in all FTS5 forms — ``col:unit``,
``{col1 col2}:unit``, ``-col:unit`` (negated set) — and scope BOTH the
unit's match and its bm25 stats to the named columns (tf counts only
filtered-column occurrences, df counts rows with a filtered-column hit
— probed; dl stays the all-column length). Unknown column names raise,
matching FTS5's "no such column" error class.

``NEAR(p1 p2 ... pk, N)`` groups are supported (default N = 10), with
the probed FTS5 semantics: the group matches a row iff some choice of
one instance per phrase within a SINGLE column satisfies
``maxStart − minEnd − 1 ≤ N`` (order-free); each member phrase then
scores with tf = its PARTICIPATING instances (members of at least one
valid cluster) and df = its standalone row count. A column filter
ahead of the group (``col:NEAR(...)``) scopes every member.

``^`` initial-token anchors and ``a + b`` phrase glue are supported
(probed semantics: anchored instances only match at a column's token
0 and only they count toward tf; glue concatenates adjacent units into
one phrase). Barewords accept exactly FTS5's character set — ASCII
alphanumerics, ``_``, and non-ASCII; any other ASCII punctuation
inside a bareword (``state-of-the-art``, ``don't``) is a syntax error
in FTS5 and raises here, so the service applies the reference's
query-error fallback (sqlite_store.py:246-254): retry the bare
tokens (implicit AND), never silently invent phrase semantics.

**Scoring/membership contract** (pinned by probes; see
operators/ftsquery.py): a row matches iff the boolean tree is true
over per-unit presence; the bm25 score is the sum of per-unit
contributions ``idf_u * wtf(tf_u, dl)`` restricted to units whose
ENTIRE ancestor chain matches the row — a unit under an OR branch
contributes only where that branch matches, a unit under an unmatched
AND/NOT subtree contributes nothing even when present.
:func:`match_and_actives` computes both in one generic fold usable
with Python set algebra and Spark boolean Columns alike.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from rifflux_spark.functions.tokenizer import tokenize

_COLSPEC = r"(-?)(?:\{([^}]*)\}|([A-Za-z_][A-Za-z0-9_]*))\s*:\s*"
_LEX = re.compile(
    rf'(?:{_COLSPEC})?(\^?)"([^"]*)"(\*?)|([(),+])|(?:{_COLSPEC})?(\^?)([^\s(),+^"]+)'
)
_RESERVED = {"AND", "OR", "NOT"}
NEAR_DEFAULT = 10
# the engine's indexed columns, in FTS5 table order (reference
# schema.sql: chunks_fts(content, heading_path))
COLUMNS = ("content", "heading_path")


class FtsSyntaxError(ValueError):
    pass


@dataclass(frozen=True)
class Unit:
    """A leaf: a phrase of index tokens; ``prefix`` makes the last
    token a prefix match; ``cols`` restricts match AND bm25 stats to
    those indexed columns (None = all). A single term is a 1-token
    phrase."""

    tokens: tuple[str, ...]
    prefix: bool = False
    cols: tuple[str, ...] | None = None
    # '^' anchor: the unit only matches instances starting at token 0
    # of a column (probed: tf counts anchored instances, one per
    # column at most)
    anchored: bool = False


@dataclass(frozen=True)
class NearGroup:
    """NEAR(p1 ... pk, N): leaf-group — members match/score together
    under the cluster constraint (see module docstring)."""

    units: tuple[Unit, ...]
    n: int = NEAR_DEFAULT


# AST nodes: Unit | NearGroup | ("and", l, r) | ("or", l, r) | ("not", l, r)


def _cols_from(neg: str, braced: str | None, single: str | None):
    """Resolve a column-filter spec → tuple of allowed columns, or None
    when the spec covers every column."""
    if braced is None and single is None:
        return None
    names = braced.split() if braced is not None else [single]
    for n in names:
        if n not in COLUMNS:
            raise FtsSyntaxError(f"no such column: {n}")
    allowed = tuple(c for c in COLUMNS if (c in names) != bool(neg))
    if not allowed:
        raise FtsSyntaxError("column filter excludes every column")
    return None if len(allowed) == len(COLUMNS) else allowed


def _lex(query: str) -> list:
    out: list = []
    pos = 0
    for m in _LEX.finditer(query):
        between = query[pos : m.start()]
        if between.strip():
            # only whitespace may separate tokens; an unterminated '"'
            # (excluded from every token class) lands here
            raise FtsSyntaxError(f"unexpected input: {between.strip()!r}")
        pos = m.end()
        (p_neg, p_braced, p_single, p_caret, phrase, star,
         paren, w_neg, w_braced, w_single, w_caret, word) = m.groups()
        if phrase is not None:
            cols = _cols_from(p_neg or "", p_braced, p_single)
            toks = tuple(tokenize(phrase))
            if not toks:
                raise FtsSyntaxError("empty phrase")
            out.append(
                Unit(toks, prefix=star == "*", cols=cols, anchored=p_caret == "^")
            )
        elif paren:
            out.append(paren)
        else:
            cols = _cols_from(w_neg or "", w_braced, w_single)
            anchored = w_caret == "^"
            if word in _RESERVED and cols is None and not (
                w_braced or w_single
            ):
                out.append(word)
                continue
            if word == "NEAR":
                # colspec (if any) scopes the whole group
                out.append(("NEAR", cols))
                continue
            prefix = word.endswith("*")
            if prefix:
                word = word[:-1]
            if "*" in word:
                raise FtsSyntaxError(f"non-trailing '*' in: {word!r}")
            # FTS5 barewords: ASCII alphanumerics, '_', and non-ASCII
            # only — other ASCII punctuation ('-', '.', ':', "'") is a
            # MATCH syntax error there, and must be here too, so the
            # caller's bare-terms fallback kicks in instead of this
            # lexer silently inventing phrase semantics for
            # 'state-of-the-art' (FTS5 would reject the query)
            for ch in word:
                if ch.isascii() and not (ch.isalnum() or ch == "_"):
                    raise FtsSyntaxError(f"illegal bareword char in: {word!r}")
            toks = tuple(tokenize(word))
            if not toks:
                # a bareword of non-ASCII separators (e.g. '—') folds
                # to nothing: skip (contributes no unit)
                continue
            out.append(Unit(toks, prefix=prefix, cols=cols, anchored=anchored))
    tail = query[pos:]
    if tail.strip():
        raise FtsSyntaxError(f"unexpected input: {tail.strip()!r}")
    return out


class _Parser:
    def __init__(self, toks: list) -> None:
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise FtsSyntaxError(f"trailing input at {self.peek()!r}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek() == "OR":
            self.next()
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.primary()
        while True:
            nxt = self.peek()
            if nxt == "AND" or nxt == "NOT":
                op = "and" if self.next() == "AND" else "not"
                node = (op, node, self.primary())
            else:
                return node

    def primary(self):
        t = self.peek()
        if isinstance(t, tuple) and t and t[0] == "NEAR":
            return self.near_group(self.next()[1])
        if t == "(":
            self.next()
            node = self.or_expr()
            if self.next() != ")":
                raise FtsSyntaxError("unbalanced parenthesis")
            return node
        if isinstance(t, Unit):
            # unitseq: juxtaposed units form an implicit-AND cluster
            # that binds tighter than any explicit operator; '+' glues
            # two adjacent units into ONE phrase ('a + b' ≡ '"a b"',
            # probed)
            node = self.glued()
            while isinstance(self.peek(), Unit):
                node = ("and", node, self.glued())
            return node
        raise FtsSyntaxError(f"expected a term at {t!r}")

    def glued(self) -> Unit:
        u = self.next()
        while self.peek() == "+":
            self.next()
            nxt = self.peek()
            if not isinstance(nxt, Unit):
                raise FtsSyntaxError("'+' must join two phrases")
            r = self.next()
            if u.prefix or r.anchored or u.cols != r.cols and r.cols is not None:
                raise FtsSyntaxError("invalid '+' composition")
            u = Unit(
                u.tokens + r.tokens,
                prefix=r.prefix,
                cols=u.cols,
                anchored=u.anchored,
            )
        return u

    def near_group(self, cols):
        if self.next() != "(":
            raise FtsSyntaxError("NEAR must be followed by '('")
        members: list[Unit] = []
        while isinstance(self.peek(), Unit):
            u = self.next()
            if u.cols is not None:
                raise FtsSyntaxError("column filter inside NEAR()")
            members.append(
                Unit(u.tokens, prefix=u.prefix, cols=cols, anchored=u.anchored)
            )
        if not members:
            raise FtsSyntaxError("empty NEAR()")
        n = NEAR_DEFAULT
        if self.peek() == ",":
            self.next()
            num = self.peek()
            if (
                isinstance(num, Unit)
                and len(num.tokens) == 1
                and not num.prefix
                and num.tokens[0].isdigit()
            ):
                self.next()
                n = int(num.tokens[0])
            else:
                raise FtsSyntaxError("NEAR(..., N): N must be an integer")
        if self.next() != ")":
            raise FtsSyntaxError("unbalanced NEAR(")
        return NearGroup(tuple(members), n)


def parse_fts(query: str):
    """Parse a MATCH expression → AST, or None for an effectively-empty
    query (only punctuation). Raises FtsSyntaxError on malformed input."""
    toks = _lex(query)
    if not toks:
        return None
    return _Parser(toks).parse()


def collect_units(node, out: list[Unit] | None = None) -> list[Unit]:
    """All leaf units in query order (duplicates kept — FTS5 scores a
    repeated unit once per occurrence). NEAR members are leaves."""
    if out is None:
        out = []
    if isinstance(node, Unit):
        out.append(node)
    elif isinstance(node, NearGroup):
        out.extend(node.units)
    else:
        collect_units(node[1], out)
        collect_units(node[2], out)
    return out


def leaf_groups(node, out=None):
    """Per-leaf NEAR metadata, parallel to :func:`collect_units`:
    ``out[i]`` is the NearGroup the i-th leaf belongs to, or None."""
    if out is None:
        out = []
    if isinstance(node, Unit):
        out.append(None)
    elif isinstance(node, NearGroup):
        out.extend([node] * len(node.units))
    else:
        leaf_groups(node[1], out)
        leaf_groups(node[2], out)
    return out


def match_and_actives(node, leaf):
    """One fold computing (root match, per-unit active values) in the
    caller's boolean algebra — ``leaf(i)`` supplies the i-th unit's
    presence value (collect_units order) and must support ``& | ~``.

    ``active[i]`` is true exactly where unit i's whole ancestor chain
    matches (the FTS5 contribution rule): an AND constrains each
    side's units by the other side's match, OR adds nothing (a
    matching branch makes the OR match), and NOT constrains the left
    side by the right's non-match while the right side's units can
    never contribute.
    """
    counter = [0]

    def rec(n):
        if isinstance(n, Unit):
            i = counter[0]
            counter[0] += 1
            v = leaf(i)
            return v, {i: v}
        if isinstance(n, NearGroup):
            # members' leaf values are the NEAR-trimmed presences —
            # all-or-none per row, so the group matches iff all do, and
            # each member is active exactly where the group matches
            idxs = []
            vals = []
            for _ in n.units:
                i = counter[0]
                counter[0] += 1
                idxs.append(i)
                vals.append(leaf(i))
            m = vals[0]
            for v in vals[1:]:
                m = m & v
            return m, {i: m for i in idxs}
        kind, left, right = n
        lm, la = rec(left)
        rm, ra = rec(right)
        if kind == "and":
            m = lm & rm
            act = {i: v & rm for i, v in la.items()}
            act.update({i: v & lm for i, v in ra.items()})
            return m, act
        if kind == "or":
            m = lm | rm
            act = dict(la)
            act.update(ra)
            return m, act
        # not
        m = lm & ~rm
        act = {i: v & ~rm for i, v in la.items()}
        return m, act

    return rec(node)
