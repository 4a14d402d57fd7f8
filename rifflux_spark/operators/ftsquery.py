"""FTS5 MATCH query execution: terms, prefixes (``tok*``), phrases,
and boolean AND / OR / NOT / parentheses — over the posting index, on
both execution paths.

Semantics (pinned empirically against SQLite FTS5 and enforced
rank+score-identically in tests/test_fts_rank_identity.py):

- **Membership** is the boolean tree over per-unit presence.
- **Scoring**: ``bm25 = Σ idf_u * wtf(tf_u, dl)`` over the units whose
  ENTIRE ancestor chain matches the row (probed: FTS5's xInst lists
  only surface phrase instances of matched subtrees) — a unit under an
  unmatched AND/NOT branch contributes nothing even when present; an
  OR branch contributes exactly where it matches. A repeated unit
  contributes once per occurrence; each unit scores with its own df.
- **Per-unit stats**: a term unit scores with its own df; a prefix
  unit's ``tf`` is the summed occurrences of every matching vocabulary
  term and its ``df`` the count of rows containing ANY of them; a
  phrase unit's ``tf`` is its occurrence count (overlaps included) and
  ``df`` its row count. Same ``k1/b/avgdl/dl``, ln-idf with the 1e-6
  clamp, negated score, rowid tie-break as the term path.

Scale shape (distributed): each unit yields a df-bounded
``(doc_ord, unit_id, tf, dl)`` frame — term/prefix units straight from
the pruned posting decode (prefix expansion is a vocabulary-sized
driver read, never a corpus pass), phrase units through the
candidate-recheck pipeline of operators/phrase.py. The union is ONE
groupBy(doc_ord) exchange producing per-unit tf columns + presence
flags; unit dfs ride in as a broadcast ≤n_units-row aggregate;
membership is a codegen boolean over the flags; top-k is
TakeOrderedAndProject. Worst case degrades exactly like the term
path's stopword case — wide posting decode — never a corpus scan.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rifflux_spark.config import EngineConfig
from rifflux_spark.functions.ftsparse import (
    COLUMNS,
    FtsSyntaxError,
    NearGroup,
    Unit,
    collect_units,
    leaf_groups,
    match_and_actives,
    parse_fts,
)
from rifflux_spark.functions.tokenizer import tokenize
from rifflux_spark.operators.codec import (
    POS_COL_STRIDE,
    bm25_wtf,
    decode_posting_arrow,
)
from rifflux_spark.sources.tables import IndexStore

# vocabulary expansion guard: a 1-letter prefix over a web-scale vocab
# could expand to millions of terms; FTS5 handles this with dedicated
# prefix indexes which this engine does not persist (documented seam)
MAX_PREFIX_EXPANSION = 4096


def count_unit(tokens: list[str], unit: Unit) -> int:
    """Occurrences of ``unit`` in a token list (overlapping starts
    count; prefix applies to the unit's last token; an anchored unit
    only matches at token 0)."""
    p = unit.tokens
    n, m = len(tokens), len(p)
    if m == 0 or n < m:
        return 0
    count = 0
    last = m - 1
    for i in ([0] if unit.anchored else range(n - m + 1)):
        ok = True
        for j in range(last):
            if tokens[i + j] != p[j]:
                ok = False
                break
        if ok:
            tail = tokens[i + last]
            if (tail.startswith(p[last]) if unit.prefix else tail == p[last]):
                count += 1
    return count


_COL_FIELDS = {"content": "content", "heading_path": "heading_path"}


def count_unit_cols(col_tokens: dict[str, list[str]], unit: Unit) -> int:
    """Unit occurrences summed over its allowed columns (FTS5 column
    filters scope tf to the filtered columns — probed)."""
    cols = unit.cols or COLUMNS
    return sum(count_unit(col_tokens[c], unit) for c in cols)


def unit_instances(tokens: list[str], unit: Unit) -> list[tuple[int, int]]:
    """(start, end) token positions of every instance of ``unit`` in a
    single column's token list (end inclusive; prefix on last token)."""
    p = unit.tokens
    n, m = len(tokens), len(p)
    out: list[tuple[int, int]] = []
    if m == 0 or n < m:
        return out
    last = m - 1
    for i in ([0] if unit.anchored else range(n - m + 1)):
        ok = True
        for j in range(last):
            if tokens[i + j] != p[j]:
                ok = False
                break
        if ok:
            tail = tokens[i + last]
            if tail.startswith(p[last]) if unit.prefix else tail == p[last]:
                out.append((i, i + last))
    return out


def near_participating(
    inst_lists: list[list[tuple[int, int]]], n: int
) -> list[list[tuple[int, int]]]:
    """FTS5 NEAR participation: per member, the instances that belong
    to at least one valid cluster.

    A set of one instance per member is a valid cluster iff
    ``maxStart − minEnd − 1 ≤ n``; equivalently (separable form) there
    is a threshold E with every member owning an instance whose
    ``end ≥ E`` and ``start ≤ E + n + 1``. Instance x participates iff
    some feasible E lies in ``[start_x − n − 1, end_x]``. Feasibility
    per other member is a union of intervals ``[s − n − 1, e]``, so it
    suffices to test the candidate thresholds
    ``{start_x − n − 1} ∪ {s_other − n − 1}`` clipped to x's range.
    """
    k = len(inst_lists)
    if any(not l for l in inst_lists):
        return [[] for _ in range(k)]
    out: list[list[tuple[int, int]]] = []
    for j in range(k):
        others = [inst_lists[q] for q in range(k) if q != j]
        kept: list[tuple[int, int]] = []
        for s_x, e_x in inst_lists[j]:
            lo = s_x - n - 1
            cands = {lo}
            for lst in others:
                for s2, _e2 in lst:
                    c = s2 - n - 1
                    if lo <= c <= e_x:
                        cands.add(c)
            for ecand in cands:
                if ecand > e_x:
                    continue
                if all(
                    any(e2 >= ecand and s2 <= ecand + n + 1 for s2, e2 in lst)
                    for lst in others
                ):
                    kept.append((s_x, e_x))
                    break
        out.append(kept)
    return out


def near_trim(
    inst_lists: list[list[tuple[int, int]]], n: int
) -> list[int]:
    """Participating-instance COUNTS per member (the bm25 tf)."""
    return [len(l) for l in near_participating(inst_lists, n)]


def unit_idf(n_docs: int, df_u: int) -> float:
    idf = math.log((n_docs - df_u + 0.5) / (df_u + 0.5))
    return idf if idf > 0 else 1e-6


def expand_prefix_local(store: IndexStore, prefix: str) -> list[str]:
    """Vocabulary terms starting with ``prefix`` — a coordinator-side
    filtered read of term_stats (vocabulary-sized, term_bucket hash
    partitioning cannot prune a prefix so every bucket file is
    touched; columns are pruned to ``term``). Served from the cached
    vocabulary table when it fits the budget — zero parquet IO warm."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from rifflux_spark.operators.local_exec import pq_file, term_stats_cached

    cached = term_stats_cached(store)
    if cached is not None:
        t = cached[1]
        out = t.filter(pc.starts_with(t.column("term"), prefix)).column("term").to_pylist()
        if len(out) > MAX_PREFIX_EXPANSION:
            raise FtsSyntaxError(
                f"prefix '{prefix}*' expands past {MAX_PREFIX_EXPANSION} terms"
            )
        return sorted(out)
    out: list[str] = []
    for f in store.data_files("term_stats"):
        t = pq_file(f).read(columns=["term"])
        mask = pc.starts_with(t.column("term"), prefix)
        out.extend(t.filter(mask).column("term").to_pylist())
        if len(out) > MAX_PREFIX_EXPANSION:
            raise FtsSyntaxError(
                f"prefix '{prefix}*' expands past {MAX_PREFIX_EXPANSION} terms"
            )
    return sorted(out)


def _units_needing(units: list[Unit], store: IndexStore):
    """Resolve each unit to the index terms whose postings it needs.
    A prefix tail whose length has a PREFIX INDEX (operators/prefix.py,
    ``store.prefix_lengths``) resolves to its single merged marker term
    — one posting list, no vocabulary scan, no expansion cap; other
    tails expand against the vocabulary. Returns (per-unit term lists,
    the union term list)."""
    from rifflux_spark.operators.prefix import marker

    indexed = set(getattr(store, "prefix_lengths", ()) or ())
    per_unit: list[list[str]] = []
    for u in units:
        if u.prefix:
            p = u.tokens[-1]
            if len(p) in indexed:
                tail = [marker(p)]
            else:
                tail = expand_prefix_local(store, p)
            terms = sorted(set(u.tokens[:-1]) | set(tail))
        else:
            terms = sorted(set(u.tokens))
        per_unit.append(terms)
    all_terms = sorted({t for terms in per_unit for t in terms})
    return per_unit, all_terms


# --------------------------------------------------------------- local path


class _PositionalCtx:
    """Local-path positional instance provider (operators/positions.py):
    when the index stores poslists, recheck-class units (multi-token /
    column-filtered / anchored / prefix-tail-in-phrase) and NEAR members
    compute their instances from position intersection instead of
    rehydrated text. A unit falls back to text recheck when its prefix
    tail cannot be enumerated (marker-indexed length whose expansion
    overflows) — correctness is path-independent, pinned in
    tests/test_positional_phrase.py and the NEAR identity suite."""

    # NEAR distances at or past this cannot be proven column-local by
    # the stride encoding — fall back to text recheck (never hit by
    # sane queries; FTS5 default N is 10)
    MAX_NEAR = POS_COL_STRIDE // 2

    def __init__(self, store: IndexStore, units: list[Unit], groups: list) -> None:
        self._pos: dict[str, dict[int, "np.ndarray"]] = {}
        self._slots: dict[int, list[list[str]]] = {}
        if not store.has_positions():
            return
        needed: set[str] = set()
        for i, u in enumerate(units):
            in_near = groups[i] is not None
            recheck_class = not (
                len(u.tokens) == 1 and u.cols is None and not u.anchored
            )
            if not (in_near or recheck_class):
                continue
            slots = _unit_slot_terms(store, u)
            if slots is None:
                continue  # expansion overflow — unit stays on text recheck
            self._slots[i] = slots
            for s in slots:
                needed.update(s)
        if self._slots:
            from rifflux_spark.operators.positions import local_positions

            self._pos, _ = local_positions(store, sorted(needed))

    def usable(self, i: int) -> bool:
        return i in self._slots

    def starts(self, i: int, unit: Unit, doc: int) -> "np.ndarray":
        """Strided instance starts of unit ``i`` in ``doc`` (anchored
        applied; column filtering is the caller's, since NEAR scopes it
        group-wide)."""
        from rifflux_spark.operators.positions import phrase_instance_starts

        slot_arrays: list[np.ndarray] = []
        for terms in self._slots[i]:
            arrs = [
                a
                for a in (self._pos.get(t, {}).get(doc) for t in terms)
                if a is not None
            ]
            if not arrs:
                return np.empty(0, dtype=np.int64)
            slot_arrays.append(
                arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            )
        starts = phrase_instance_starts(slot_arrays)
        if unit.anchored and starts.size:
            starts = starts[starts % POS_COL_STRIDE == 0]
        return starts

    def n_slots(self, i: int) -> int:
        return len(self._slots[i])


def _local_postings(store: IndexStore, terms: list[str]):
    """Decode every posting for ``terms`` coordinator-side →
    (term→{doc: tf}, doc→dl)."""
    from rifflux_spark.functions.xxhash64 import term_bucket
    from rifflux_spark.operators.local_exec import _bucket_files, _read_filtered

    tf_by_term: dict[str, dict[int, int]] = {t: {} for t in terms}
    dl_map: dict[int, int] = {}
    if not terms:
        return tf_by_term, dl_map
    buckets = {term_bucket(t, store.n_term_buckets) for t in terms}
    files = _bucket_files(store, "postings", buckets)
    t = _read_filtered(
        files, ["term", "n_docs", "first_doc", "gaps", "tfs", "dls"], terms
    )
    if t is None:
        return tf_by_term, dl_map
    docs, tfs, dls, ns = decode_posting_arrow(t)
    # vectorized per-term grouping (no per-posting Python loop): posting
    # rows for one term are contiguous runs in block order — group block
    # rows by term, slice each term's posting span, and fold duplicate
    # doc entries (merged marker terms) with a bincount
    block_terms = t.column("term").to_pylist()
    starts = np.concatenate(([0], np.cumsum(ns)))
    by_term: dict[str, list[tuple[int, int]]] = {}
    for i, term in enumerate(block_terms):
        by_term.setdefault(term, []).append((int(starts[i]), int(starts[i + 1])))
    dl_map.update(zip(docs.tolist(), dls.tolist()))
    for term, spans in by_term.items():
        if len(spans) == 1:
            s, e = spans[0]
            d_arr, t_arr = docs[s:e], tfs[s:e]
        else:
            d_arr = np.concatenate([docs[s:e] for s, e in spans])
            t_arr = np.concatenate([tfs[s:e] for s, e in spans])
        uniq, inv = np.unique(d_arr, return_inverse=True)
        if uniq.size == d_arr.size:
            tf_by_term[term] = dict(zip(d_arr.tolist(), t_arr.tolist()))
        else:
            sums = np.bincount(inv, weights=t_arr).astype(np.int64)
            tf_by_term[term] = dict(zip(uniq.tolist(), sums.tolist()))
    return tf_by_term, dl_map


def fts_topk_local(
    store: IndexStore,
    query: str,
    top_k: int = 10,
    config: EngineConfig | None = None,
    cstats: dict | None = None,
) -> list[tuple[int, float]]:
    """Coordinator-path MATCH evaluation: [(doc_ord, negated_score)],
    best first. Raises FtsSyntaxError on malformed queries (callers
    apply the reference's bare-terms fallback)."""
    from rifflux_spark.operators.local_exec import local_tombstones, rehydrate_local

    config = config or EngineConfig()
    ast = parse_fts(query)
    if ast is None:
        return []
    units = collect_units(ast)
    cstats = cstats or store.corpus_stats()
    n_docs, avgdl = int(cstats["n_docs"]), float(cstats["avgdl"])

    per_unit_terms, all_terms = _units_needing(units, store)
    tf_by_term, dl_map = _local_postings(store, all_terms)
    tombs = set(int(x) for x in local_tombstones(store))
    groups = leaf_groups(ast)
    posctx = _PositionalCtx(store, units, groups)

    rehydrated: dict[int, dict] = {}

    def rehydrate(cand: set) -> None:
        missing = sorted(cand - rehydrated.keys())
        if missing:
            rehydrated.update(rehydrate_local(store, missing))

    def col_tokens(c: dict) -> dict[str, list[str]]:
        return {
            "content": tokenize(c["content"]),
            "heading_path": tokenize(c["heading_path"]),
        }

    def standalone_map(i: int, u: Unit, terms: list[str]) -> dict[int, int]:
        # postings carry COMBINED-column tf, so only unfiltered
        # single-token units score straight from them; anything with a
        # column filter, multiple tokens, or a prefix TAIL inside a
        # phrase goes through the candidate-recheck branch
        if (
            len(u.tokens) == 1
            and not u.prefix
            and u.cols is None
            and not u.anchored
        ):
            return dict(tf_by_term.get(u.tokens[0], {}))
        if (
            len(u.tokens) == 1
            and u.prefix
            and u.cols is None
            and not u.anchored
        ):
            from rifflux_spark.operators.prefix import tail_match_terms

            agg: dict[int, int] = {}
            for t in tail_match_terms(terms, u.tokens[0]):
                for d, tf in tf_by_term.get(t, {}).items():
                    agg[d] = agg.get(d, 0) + tf
            return agg
        # AND-intersect candidates from the combined postings (a
        # superset of any column-scoped match), then recheck on the
        # rehydrated per-column text
        full_tokens = u.tokens[:-1] if u.prefix else u.tokens
        full = [set(tf_by_term.get(t, {})) for t in sorted(set(full_tokens))]
        if u.prefix:
            from rifflux_spark.operators.prefix import tail_match_terms

            tail_docs = set()
            for t in tail_match_terms(terms, u.tokens[-1]):
                tail_docs.update(tf_by_term.get(t, {}))
            full.append(tail_docs)
        if not full or any(not s for s in full):
            return {}
        cand = set.intersection(*full)
        counts: dict[int, int] = {}
        if posctx.usable(i):
            # positional recheck: instance starts from poslist
            # intersection — no rehydration
            from rifflux_spark.operators.positions import filter_unit_starts

            for d in cand:
                starts = filter_unit_starts(posctx.starts(i, u, d), False, u.cols)
                if starts.size:
                    counts[d] = int(starts.size)
            return counts
        rehydrate(cand)
        for d in cand:
            c = rehydrated.get(d)
            if c is None:
                continue
            tf = count_unit_cols(col_tokens(c), u)
            if tf > 0:
                counts[d] = tf
        return counts

    standalone: list[dict[int, int]] = [
        standalone_map(i, u, terms)
        for i, (u, terms) in enumerate(zip(units, per_unit_terms))
    ]
    if tombs:
        standalone = [
            {d: tf for d, tf in m.items() if d not in tombs}
            for m in standalone
        ]

    # NEAR groups: replace member tf maps with participation-trimmed
    # ones (per-column clusters, df stays the standalone row count)
    unit_tf: list[dict[int, int]] = list(standalone)
    done_groups: set[int] = set()
    for gi, g in enumerate(groups):
        if g is None or id(g) in done_groups:
            continue
        done_groups.add(id(g))
        idxs = [i for i, gg in enumerate(groups) if gg is g]
        members = [units[i] for i in idxs]
        cand = set.intersection(*[set(standalone[i]) for i in idxs]) if all(
            standalone[i] for i in idxs
        ) else set()
        trimmed: list[dict[int, int]] = [{} for _ in idxs]
        if cand and all(posctx.usable(ii) for ii in idxs) and g.n < _PositionalCtx.MAX_NEAR:
            # positional NEAR: strided instances make cross-column
            # clusters numerically infeasible, so ONE near_trim over
            # the combined lists equals the per-column sum
            from rifflux_spark.operators.positions import filter_unit_starts

            allowed = members[0].cols
            for d in cand:
                inst = []
                for j, ii in enumerate(idxs):
                    s = filter_unit_starts(
                        posctx.starts(ii, members[j], d), False, allowed
                    )
                    m = posctx.n_slots(ii)
                    inst.append([(int(p), int(p) + m - 1) for p in s])
                counts = near_trim(inst, g.n)
                if all(c > 0 for c in counts):
                    for j, cnt in enumerate(counts):
                        trimmed[j][d] = cnt
        elif cand:
            rehydrate(cand)
            allowed = members[0].cols or COLUMNS
            for d in cand:
                c = rehydrated.get(d)
                if c is None:
                    continue
                ct = col_tokens(c)
                totals = [0] * len(members)
                for colname in allowed:
                    inst = [
                        unit_instances(ct[colname], mu) for mu in members
                    ]
                    counts = near_trim(inst, g.n)
                    for j, cnt in enumerate(counts):
                        totals[j] += cnt
                if all(t > 0 for t in totals):
                    for j, t in enumerate(totals):
                        trimmed[j][d] = t
        for j, i in enumerate(idxs):
            unit_tf[i] = trimmed[j]

    matched, actives = match_and_actives(
        ast, lambda i: _DocSet(set(unit_tf[i]))
    )
    docs = sorted(matched.docs)
    if not docs:
        return []
    pos = {d: i for i, d in enumerate(docs)}
    idfs = [unit_idf(n_docs, len(m)) for m in standalone]
    k1, b = config.bm25_k1, config.bm25_b
    scores = np.zeros(len(docs), dtype=np.float64)
    dls = np.array([dl_map[d] for d in docs], dtype=np.float64)
    for i, (idf, m) in enumerate(zip(idfs, unit_tf)):
        # FTS5 contribution rule: only where the unit's ancestor chain
        # matches (actives[i] ⊆ matched by construction)
        act = actives.get(i)
        if act is None or not act.docs:
            continue
        idxs = np.array(sorted(pos[d] for d in act.docs), dtype=np.int64)
        tf = np.array(
            [m[docs[j]] for j in idxs], dtype=np.float64
        )
        scores[idxs] += idf * bm25_wtf(tf, dls[idxs], avgdl, k1, b)
    docs_arr = np.array(docs, dtype=np.int64)
    order = np.lexsort((docs_arr, -scores))[:top_k]
    return [(int(docs_arr[i]), float(-scores[i])) for i in order]


class _DocSet:
    """Set algebra with complement support for the membership fold:
    ``NOT`` needs l & ~r, so ~r is represented lazily as (set,
    complemented) and every operator resolves the four sign cases."""

    def __init__(self, docs: set, complemented: bool = False) -> None:
        self.docs = docs
        self.complemented = complemented

    def __invert__(self) -> "_DocSet":
        return _DocSet(self.docs, not self.complemented)

    def __and__(self, other: "_DocSet") -> "_DocSet":
        if not self.complemented and not other.complemented:
            return _DocSet(self.docs & other.docs)
        if not self.complemented and other.complemented:
            return _DocSet(self.docs - other.docs)
        if self.complemented and not other.complemented:
            return _DocSet(other.docs - self.docs)
        return _DocSet(self.docs | other.docs, True)

    def __or__(self, other: "_DocSet") -> "_DocSet":
        if not self.complemented and not other.complemented:
            return _DocSet(self.docs | other.docs)
        if not self.complemented and other.complemented:
            return _DocSet(other.docs - self.docs, True)
        if self.complemented and not other.complemented:
            return _DocSet(self.docs - other.docs, True)
        return _DocSet(self.docs & other.docs, True)


# ---------------------------------------------------------- distributed path

_UNIT_ROW = T.StructType(
    [
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("unit_id", T.IntegerType(), False),
        T.StructField("tf", T.LongType(), False),
        T.StructField("dl", T.LongType(), False),
    ]
)


def _unit_frames(
    spark,
    store: IndexStore,
    units: list[Unit],
    per_unit_terms: list[list[str]],
    groups: list | None = None,
) -> DataFrame | None:
    """Union of per-unit (doc_ord, unit_id, tf, dl) frames.

    NEAR members emit TWO frames: their standalone frame under
    ``unit_id + len(units)`` (df = the phrase's global row count —
    probed FTS5 behavior) and a participation-trimmed frame under their
    real id from the group verify kernel (used for tf + membership).
    """
    groups = groups or [None] * len(units)
    n_units = len(units)

    def sid(i: int) -> int:
        # near members' standalone rows carry a shifted id (df only)
        return i + n_units if groups[i] is not None else i

    frames: list[DataFrame] = []
    # group all pure term/prefix units into ONE posting decode: decode
    # once for the union of their terms, then map term→(unit_id) rows
    simple = [
        (i, terms)
        for i, (u, terms) in enumerate(zip(units, per_unit_terms))
        if len(u.tokens) == 1 and u.cols is None and not u.anchored
    ]
    term_units: dict[str, list[int]] = {}
    for i, terms in simple:
        for t in terms:
            term_units.setdefault(t, []).append(sid(i))
    if term_units:
        all_simple_terms = sorted(term_units)
        decoded = _decode_unit_postings(store, all_simple_terms)
        mapping = spark.createDataFrame(
            [(t, i) for t, ids in term_units.items() for i in ids],
            "term string, unit_id int",
        )
        frames.append(
            decoded.join(F.broadcast(mapping), "term")
            .groupBy("doc_ord", "unit_id")
            .agg(
                F.sum("tf").cast("long").alias("tf"),
                F.first("dl").alias("dl"),
            )
            .select("doc_ord", "unit_id", "tf", "dl")
        )
    has_pos = store.has_positions()
    for i, (u, terms) in enumerate(zip(units, per_unit_terms)):
        if len(u.tokens) == 1 and u.cols is None and not u.anchored:
            continue
        f = (
            _phrase_unit_frame_positional(spark, store, u, sid(i))
            if has_pos
            else None
        )
        if f is None:
            f = _phrase_unit_frame(spark, store, u, terms, sid(i))
        frames.append(f)
    # one trimmed frame per distinct NEAR group
    done: set[int] = set()
    for i, g in enumerate(groups):
        if g is None or id(g) in done:
            continue
        done.add(id(g))
        idxs = [j for j, gg in enumerate(groups) if gg is g]
        f = (
            _near_group_frame_positional(spark, store, g, idxs)
            if has_pos
            else None
        )
        if f is None:
            f = _near_group_frame(
                spark, store, g, idxs, [per_unit_terms[j] for j in idxs]
            )
        frames.append(f)
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _near_group_frame(
    spark,
    store: IndexStore,
    group,
    member_ids: list[int],
    member_terms: list[list[str]],
) -> DataFrame:
    """Participation-trimmed rows for one NEAR group: candidates are
    docs containing every member (combined-postings superset), the
    verify kernel runs the per-column cluster test and emits one row
    per (doc, member) where the group matches."""
    members = list(group.units)
    all_terms = sorted({t for ts in member_terms for t in ts})
    decoded = _decode_unit_postings(store, all_terms)
    pairs: set[tuple[str, str]] = set()
    n_groups = 0
    for j, (mu, terms) in enumerate(zip(members, member_terms)):
        full = sorted(set(mu.tokens[:-1] if mu.prefix else mu.tokens))
        for t in full:
            pairs.add((t, f"{j}:{t}"))
        n_groups += len(full)
        if mu.prefix:
            from rifflux_spark.operators.prefix import tail_match_terms

            for t in tail_match_terms(terms, mu.tokens[-1]):
                pairs.add((t, f"{j}:tail"))
            n_groups += 1
    gmap = spark.createDataFrame(sorted(pairs), "term string, grp string")
    cand = (
        decoded.join(F.broadcast(gmap), "term")
        .groupBy("doc_ord")
        .agg(
            F.countDistinct("grp").alias("n_grps"),
            F.first("dl").alias("dl"),
        )
        .filter(F.col("n_grps") == n_groups)
        .select("doc_ord", "dl")
    )
    from rifflux_spark.operators.phrase import _cand_join
    from rifflux_spark.operators.local_exec import local_df

    group_fulls = sorted(
        {
            t
            for mu in members
            for t in (mu.tokens[:-1] if mu.prefix else mu.tokens)
        }
    )
    dfs = local_df(store, group_fulls)
    bound = min(dfs.values()) if dfs else None
    chunks = store.chunks().select("doc_ord", "content", "heading_path")
    cand_chunks = _cand_join(chunks, cand, bound)
    allowed = members[0].cols or COLUMNS
    n_near = group.n
    ids = list(member_ids)

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_doc: list[int] = []
            out_uid: list[int] = []
            out_tf: list[int] = []
            out_dl: list[int] = []
            for doc, content, heading, dl in zip(
                pdf["doc_ord"], pdf["content"], pdf["heading_path"], pdf["dl"]
            ):
                ct = {
                    "content": tokenize(content),
                    "heading_path": tokenize(heading),
                }
                totals = [0] * len(members)
                for colname in allowed:
                    inst = [unit_instances(ct[colname], mu) for mu in members]
                    counts = near_trim(inst, n_near)
                    for j, cnt in enumerate(counts):
                        totals[j] += cnt
                if all(t > 0 for t in totals):
                    for j, t in enumerate(totals):
                        out_doc.append(doc)
                        out_uid.append(ids[j])
                        out_tf.append(t)
                        out_dl.append(dl)
            yield pd.DataFrame(
                {
                    "doc_ord": pd.Series(out_doc, dtype="int64"),
                    "unit_id": pd.Series(out_uid, dtype="int32"),
                    "tf": pd.Series(out_tf, dtype="int64"),
                    "dl": pd.Series(out_dl, dtype="int64"),
                }
            )

    return cand_chunks.select(
        "doc_ord", "content", "heading_path", "dl"
    ).mapInPandas(verify, schema=_UNIT_ROW)


def _decode_unit_postings(store: IndexStore, terms: list[str]) -> DataFrame:
    """Posting blocks for ``terms`` → (doc_ord, term, tf, dl) rows
    (Arrow-native: payload bytes flow straight from the record batch's
    binary buffers, term labels repeat via Arrow take — no pandas)."""

    def decode(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            docs, tf, dl, ns = decode_posting_arrow(rb)
            row_idx = np.repeat(np.arange(rb.num_rows, dtype=np.int64), ns)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(docs, pa.int64()),
                    pc.take(rb.column("term"), pa.array(row_idx)),
                    pa.array(tf, pa.int64()),
                    pa.array(dl, pa.int64()),
                ],
                names=["doc_ord", "term", "tf", "dl"],
            )

    schema = T.StructType(
        [
            T.StructField("doc_ord", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.LongType(), False),
            T.StructField("dl", T.LongType(), False),
        ]
    )
    cols = ["term", "gaps", "tfs", "dls", "n_docs", "first_doc"]
    blocks = store.postings_for_terms(terms)
    return blocks.select(*cols).mapInArrow(decode, schema=schema)


def _phrase_unit_frame(
    spark, store: IndexStore, unit: Unit, terms: list[str], unit_id: int
) -> DataFrame:
    """Candidate-recheck frame for one phrase unit (prefix-tail aware):
    (doc_ord, unit_id, tf, dl) where tf > 0."""
    decoded = _decode_unit_postings(store, terms)
    if unit.prefix:
        from rifflux_spark.operators.prefix import tail_match_terms

        full = sorted(set(unit.tokens[:-1]))
        tail = tail_match_terms(terms, unit.tokens[-1])
        # presence groups: each full token is its own group; the tail
        # expansion is ONE group (any match counts). A term can play
        # BOTH roles ("cache cach*" where the expansion includes
        # "cache"), so the mapping is pairs, not a dict.
        pairs = [(t, t) for t in full] + [(t, "\x00tail") for t in tail]
        n_groups = len(full) + 1
        gmap = spark.createDataFrame(pairs, "term string, grp string")
        grouped = decoded.join(F.broadcast(gmap), "term")
        cand = (
            grouped.groupBy("doc_ord")
            .agg(
                F.countDistinct("grp").alias("n_grps"),
                F.first("dl").alias("dl"),
            )
            .filter(F.col("n_grps") == n_groups)
            .select("doc_ord", "dl")
        )
    else:
        uniq = sorted(set(unit.tokens))
        cand = (
            decoded.groupBy("doc_ord")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.first("dl").alias("dl"),
            )
            .filter(F.col("n_terms") == len(uniq))
            .select("doc_ord", "dl")
        )
    from rifflux_spark.operators.phrase import _cand_join
    from rifflux_spark.operators.local_exec import local_df

    full_terms = sorted(set(unit.tokens[:-1] if unit.prefix else unit.tokens))
    dfs = local_df(store, full_terms)
    bound = min(dfs.values()) if dfs else None
    chunks = store.chunks().select("doc_ord", "content", "heading_path")
    cand_chunks = _cand_join(chunks, cand, bound)
    u = unit

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            tfs = [
                count_unit_cols(
                    {
                        "content": tokenize(content),
                        "heading_path": tokenize(heading),
                    },
                    u,
                )
                for content, heading in zip(pdf["content"], pdf["heading_path"])
            ]
            out = pd.DataFrame(
                {
                    "doc_ord": pdf["doc_ord"],
                    "unit_id": np.int32(unit_id),
                    "tf": pd.Series(tfs, dtype="int64"),
                    "dl": pdf["dl"],
                }
            )
            yield out[out["tf"] > 0]

    return cand_chunks.select("doc_ord", "content", "heading_path", "dl").mapInPandas(
        verify, schema=_UNIT_ROW
    )


def _unit_slot_terms(store: IndexStore, unit: Unit) -> list[list[str]] | None:
    """Per-slot index terms for positional evaluation: exact tokens are
    their own slot; a prefix tail expands against the vocabulary
    (markers carry no positions). None = not positionally evaluable
    (expansion overflow) — caller falls back to text recheck."""
    from rifflux_spark.operators.prefix import is_marker

    slots: list[list[str]] = [[t] for t in (unit.tokens[:-1] if unit.prefix else unit.tokens)]
    if unit.prefix:
        try:
            tail = [
                t
                for t in expand_prefix_local(store, unit.tokens[-1])
                if not is_marker(t)
            ]
        except FtsSyntaxError:
            return None
        slots.append(tail)
    return slots


def _grouped_slot_positions(spark, store: IndexStore, slot_pairs, n_slots: int):
    """Positional rows → one row per doc with every slot present:
    (doc_ord, dl, parts=[(slot, pos-binary)...]). ``slot_pairs`` =
    (term, slot-label) pairs; a term may serve several slots."""
    from rifflux_spark.operators.positions import _decode_to_rows

    terms = sorted({t for t, _ in slot_pairs})
    rows = _decode_to_rows(store.positions_for_terms(terms))
    smap = spark.createDataFrame(sorted(set(slot_pairs)), "term string, slot string")
    return (
        rows.join(F.broadcast(smap), "term")
        .groupBy("doc_ord")
        .agg(
            F.max("dl").alias("dl"),
            F.countDistinct("slot").alias("n_slots"),
            F.collect_list(F.struct("slot", "pos")).alias("parts"),
        )
        .filter(F.col("n_slots") == n_slots)
        .select("doc_ord", "dl", "parts")
    )


def _slot_arrays_of(parts, labels: list[str]) -> list[np.ndarray] | None:
    """parts=[(slot, pos-bin)...] → per-label sorted-unique position
    arrays (None when a label is absent)."""
    by: dict[str, list[np.ndarray]] = {}
    for p in parts:
        # array<struct> arrives as dicts through mapInPandas
        slot, pos = (p["slot"], p["pos"]) if isinstance(p, dict) else (p[0], p[1])
        by.setdefault(slot, []).append(np.frombuffer(pos, dtype="<u4").astype(np.int64))
    out: list[np.ndarray] = []
    for lab in labels:
        arrs = by.get(lab)
        if not arrs:
            return None
        out.append(arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs)))
    return out


def _phrase_unit_frame_positional(
    spark, store: IndexStore, unit: Unit, unit_id: int
) -> DataFrame | None:
    """Positional twin of :func:`_phrase_unit_frame`: instance counts
    from poslist intersection — candidates bounded by position-
    intersected df, zero chunk-table access."""
    slots = _unit_slot_terms(store, unit)
    if slots is None:
        return None
    labels = [str(j) for j in range(len(slots))]
    pairs = [(t, lab) for lab, terms in zip(labels, slots) for t in terms]
    if not pairs or any(not terms for terms in slots):
        return (
            spark.createDataFrame([], _UNIT_ROW)
        )
    grouped = _grouped_slot_positions(spark, store, pairs, len(slots))
    u = unit

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rifflux_spark.operators.positions import (
            filter_unit_starts,
            phrase_instance_starts,
        )

        for pdf in batches:
            if pdf.empty:
                continue
            tfs = np.zeros(len(pdf), dtype=np.int64)
            for r, parts in enumerate(pdf["parts"]):
                arrs = _slot_arrays_of(parts, labels)
                if arrs is None:
                    continue
                starts = filter_unit_starts(
                    phrase_instance_starts(arrs), u.anchored, u.cols
                )
                tfs[r] = starts.size
            out = pd.DataFrame(
                {
                    "doc_ord": pdf["doc_ord"],
                    "unit_id": np.int32(unit_id),
                    "tf": tfs,
                    "dl": pdf["dl"],
                }
            )
            yield out[out["tf"] > 0]

    return grouped.mapInPandas(count, schema=_UNIT_ROW)


def _near_group_frame_positional(
    spark,
    store: IndexStore,
    group,
    member_ids: list[int],
) -> DataFrame | None:
    """Positional twin of :func:`_near_group_frame`: participation
    trimming over strided instances (cross-column clusters numerically
    infeasible, so one near_trim equals the per-column sum)."""
    members = list(group.units)
    if group.n >= _PositionalCtx.MAX_NEAR:
        return None
    member_slots: list[list[list[str]]] = []
    for mu in members:
        slots = _unit_slot_terms(store, mu)
        if slots is None:
            return None
        member_slots.append(slots)
    labels_of: list[list[str]] = []
    pairs: list[tuple[str, str]] = []
    for j, slots in enumerate(member_slots):
        labs = [f"{j}:{s}" for s in range(len(slots))]
        labels_of.append(labs)
        for lab, terms in zip(labs, slots):
            for t in terms:
                pairs.append((t, lab))
    n_slots = sum(len(s) for s in member_slots)
    if any(not terms for slots in member_slots for terms in slots):
        return spark.createDataFrame([], _UNIT_ROW)
    grouped = _grouped_slot_positions(spark, store, pairs, n_slots)
    allowed = members[0].cols
    n_near = group.n
    ids = list(member_ids)
    anchored = [mu.anchored for mu in members]

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rifflux_spark.operators.positions import (
            filter_unit_starts,
            phrase_instance_starts,
        )

        for pdf in batches:
            if pdf.empty:
                continue
            out_doc: list[int] = []
            out_uid: list[int] = []
            out_tf: list[int] = []
            out_dl: list[int] = []
            for doc, dl, parts in zip(pdf["doc_ord"], pdf["dl"], pdf["parts"]):
                inst = []
                ok = True
                for j, labs in enumerate(labels_of):
                    arrs = _slot_arrays_of(parts, labs)
                    if arrs is None:
                        ok = False
                        break
                    starts = phrase_instance_starts(arrs)
                    if anchored[j] and starts.size:
                        starts = starts[starts % POS_COL_STRIDE == 0]
                    starts = filter_unit_starts(starts, False, allowed)
                    m = len(labs)
                    inst.append([(int(p), int(p) + m - 1) for p in starts])
                if not ok:
                    continue
                counts = near_trim(inst, n_near)
                if all(c > 0 for c in counts):
                    for j, t in enumerate(counts):
                        out_doc.append(doc)
                        out_uid.append(ids[j])
                        out_tf.append(t)
                        out_dl.append(dl)
            yield pd.DataFrame(
                {
                    "doc_ord": pd.Series(out_doc, dtype="int64"),
                    "unit_id": pd.Series(out_uid, dtype="int32"),
                    "tf": pd.Series(out_tf, dtype="int64"),
                    "dl": pd.Series(out_dl, dtype="int64"),
                }
            )

    return grouped.mapInPandas(verify, schema=_UNIT_ROW)


def fts_topk(
    spark,
    store: IndexStore,
    query: str,
    top_k: int = 10,
    config: EngineConfig | None = None,
    cstats: dict | None = None,
) -> DataFrame:
    """Distributed MATCH evaluation → (doc_ord, bm25_score), negated,
    best first, ties on doc_ord (FTS5 conventions)."""
    config = config or EngineConfig()
    empty = spark.createDataFrame([], "doc_ord long, bm25_score double")
    ast = parse_fts(query)
    if ast is None:
        return empty
    units = collect_units(ast)
    cstats = cstats or store.corpus_stats()
    n_docs, avgdl = int(cstats["n_docs"]), float(cstats["avgdl"])

    per_unit_terms, _ = _units_needing(units, store)
    groups = leaf_groups(ast)
    unioned = _unit_frames(spark, store, units, per_unit_terms, groups)
    if unioned is None:
        return empty
    if store.exists("tombstones"):
        unioned = unioned.join(
            F.broadcast(store.tombstones()), on="doc_ord", how="left_anti"
        )

    n_units = len(units)
    # per-unit df as a broadcast dimension. NEAR members have rows
    # under TWO ids: the trimmed real id and the standalone shifted id
    # (i + n_units); their df is the standalone (global phrase) count —
    # probed FTS5 behavior — so remap and take the max.
    unit_df = (
        unioned.groupBy("unit_id")
        .agg(F.count("*").cast("long").alias("df_u"))
        .withColumn(
            "unit_id",
            F.when(
                F.col("unit_id") >= n_units, F.col("unit_id") - n_units
            ).otherwise(F.col("unit_id")),
        )
        .groupBy("unit_id")
        .agg(F.max("df_u").alias("df_u"))
    )
    k1, b = config.bm25_k1, config.bm25_b
    idf_raw = F.log(
        (F.lit(float(n_docs)) - F.col("df_u") + 0.5) / (F.col("df_u") + 0.5)
    )
    idf = F.when(idf_raw > 0, idf_raw).otherwise(F.lit(1e-6))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        unioned.filter(F.col("unit_id") < n_units)  # drop df-only rows
        .join(F.broadcast(unit_df), "unit_id")
        .select("doc_ord", "unit_id", contrib.alias("contrib"))
    )
    # per-unit contribution columns + presence flags in ONE aggregate;
    # rows are unique per (doc, unit) so max() selects the value
    aggs = []
    for i in range(n_units):
        aggs.append(
            F.max(F.when(F.col("unit_id") == i, F.col("contrib"))).alias(
                f"c_{i}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("unit_id") == i, 1).otherwise(0)).alias(
                f"has_{i}"
            )
        )
    per_doc = scored.groupBy("doc_ord").agg(*aggs)
    match_expr, actives = match_and_actives(
        ast, lambda i: F.col(f"has_{i}") == 1
    )
    # FTS5 contribution rule: a unit scores only where its whole
    # ancestor chain matches (codegen boolean over the flags)
    score = F.lit(0.0)
    for i in range(n_units):
        if i not in actives:
            # a unit on the right of a NOT can never contribute (the
            # fold drops it from the active map)
            continue
        score = score + F.when(
            actives[i], F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
        ).otherwise(F.lit(0.0))
    topk = (
        per_doc.filter(match_expr)
        .select("doc_ord", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(top_k)
    )
    return topk.select("doc_ord", (-F.col("score")).alias("bm25_score"))
