"""Impact-ordered evaluation gates (round-4 verdict #3):

- exactness invariants: prune on/off and the impact-ordered wave path
  return identical rankings and bit-identical scores per path (float
  summation order is restored to the full-decode order before the final
  aggregation);
- ``lexical_budget_postings``: under-budget queries are EXACT; over-
  budget (stopword-class) queries return the impact-ordered range-
  closure approximation whose SCORES are exact (every returned doc has
  all its postings decoded), deterministically identical between the
  coordinator and distributed paths;
- decoded work in budgeted mode is capped near the budget (the
  sublinear-growth evidence lives in bench.py's two-corpus stress
  block).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.sources.pages import synthetic_pages
from rifflux_spark.sources.tables import IndexStore

CONFIG = EngineConfig(
    block_size=16,
    salt_range=64,
    n_term_buckets=8,
    n_build_shards=2,
    embedding_dim=16,
)
# tiny budget: the synthetic corpus's Zipf-head terms exceed it
BUDGET = dataclasses.replace(CONFIG, lexical_budget_postings=600)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("budgetidx"))
    build_index(spark, synthetic_pages(spark, 200, seed=7), d, CONFIG, with_embeddings=False)
    return IndexStore(spark, d, CONFIG.n_term_buckets)


def _stopword_query(spark, store) -> str:
    rows = (
        store.term_stats()
        .orderBy("df_docs", ascending=False)
        .limit(3)
        .collect()
    )
    return " ".join(r["term"] for r in rows if not r["term"].startswith("\x01"))


def _rare_query(spark, store) -> str:
    from pyspark.sql import functions as F

    rows = (
        store.term_stats()
        .filter(~F.col("term").startswith("\x01") & (F.col("df_docs") > 1))
        .orderBy(F.asc("df_docs"), F.asc("term"))
        .limit(2)
        .collect()
    )
    return " ".join(r["term"] for r in rows)


def test_prune_and_wave_invariance(spark, store) -> None:
    from rifflux_spark.operators.bm25 import bm25_topk
    from rifflux_spark.operators.local_exec import bm25_topk_local

    for q in (_stopword_query(spark, store), _rare_query(spark, store)):
        # min_blocks_to_prune=1 forces the impact-ordered machinery on
        a = bm25_topk_local(store, q, top_k=10, config=CONFIG, prune=True, min_blocks_to_prune=1)
        b = bm25_topk_local(store, q, top_k=10, config=CONFIG, prune=False)
        assert a == b, q
        s1 = [(r["doc_ord"], r["bm25_score"]) for r in bm25_topk(spark, store, q, 10, CONFIG, prune=True, min_blocks_to_prune=1).collect()]
        s2 = [(r["doc_ord"], r["bm25_score"]) for r in bm25_topk(spark, store, q, 10, CONFIG, prune=False).collect()]
        assert s1 == s2, q


def test_under_budget_queries_stay_exact(spark, store) -> None:
    from rifflux_spark.operators.local_exec import bm25_topk_local, local_df

    q = _rare_query(spark, store)
    assert sum(local_df(store, sorted(set(q.split()))).values()) <= BUDGET.lexical_budget_postings
    assert bm25_topk_local(store, q, top_k=10, config=BUDGET) == bm25_topk_local(
        store, q, top_k=10, config=CONFIG
    )


def test_budgeted_scores_are_exact_and_paths_agree(spark, store) -> None:
    from rifflux_spark.operators.bm25 import bm25_topk
    from rifflux_spark.operators.local_exec import bm25_topk_local, local_df

    q = _stopword_query(spark, store)
    total = sum(local_df(store, sorted(set(q.split()))).values())
    assert total > BUDGET.lexical_budget_postings, "probe not over budget"

    exact = dict(bm25_topk_local(store, q, top_k=10_000, config=CONFIG))
    got = bm25_topk_local(
        store, q, top_k=10, config=BUDGET, min_blocks_to_prune=1
    )
    assert got, "budgeted mode returned nothing"
    for doc, score in got:
        # every returned doc's score equals its EXACT full score — the
        # range closure decodes all of a covered doc's postings
        assert doc in exact and abs(score - exact[doc]) < 1e-12, doc

    spark_got = [
        (r["doc_ord"], r["bm25_score"])
        for r in bm25_topk(
            spark, store, q, 10, BUDGET, prune=True, min_blocks_to_prune=1
        ).collect()
    ]
    assert [d for d, _ in spark_got] == [d for d, _ in got]
    assert all(abs(a[1] - b[1]) < 1e-12 for a, b in zip(spark_got, got))


def test_default_config_budget_is_on_and_under_budget_exact(spark, store) -> None:
    """Round-5 verdict #2: the budget mode is the DEFAULT. The default
    engages only past the posting budget, so every query on a corpus
    under it (all oracle SFs, all rank-identity suites) stays bit-
    identical to explicit exact mode; 0 opts back into exact-at-any-cost
    and the two agree wherever both are exact."""
    from rifflux_spark.operators.local_exec import bm25_topk_local, local_df

    default = EngineConfig()
    assert default.lexical_budget_postings > 0
    exact = dataclasses.replace(CONFIG, lexical_budget_postings=0)
    for q in (_stopword_query(spark, store), _rare_query(spark, store)):
        # this corpus is far under the default budget → identical to exact
        assert (
            sum(local_df(store, sorted(set(q.split()))).values())
            <= default.lexical_budget_postings
        )
        assert bm25_topk_local(store, q, top_k=10, config=CONFIG) == bm25_topk_local(
            store, q, top_k=10, config=exact
        )


def test_budget_ranges_caps_decoded_postings() -> None:
    from rifflux_spark.operators import wand

    rng = np.random.RandomState(5)
    n = 400
    terms = np.array(["a", "b"] * (n // 2))
    firsts = np.arange(n, dtype=np.int64) * 16
    lasts = firsts + 15
    ns = np.full(n, 16, dtype=np.int64)
    bound = rng.random(n)
    mask, ranges = wand.budget_ranges(terms, firsts, lasts, ns, bound, budget=160)
    # closure can overshoot by at most one group's worth of blocks
    assert 160 <= int(ns[mask].sum()) <= 160 + 2 * 16 * 2
    assert ranges
    docs = np.arange(0, n * 16, dtype=np.int64)
    inside = wand.mask_docs_to_ranges(docs, ranges)
    assert 0 < int(inside.sum()) < docs.size


def test_keyfilter_lanes_agree(spark, store, monkeypatch) -> None:
    """The distributed pruner filters kept blocks through one of two
    lanes: an In(...) literal (small key sets) or a broadcast left-semi
    join on (term, salt, block_seq) past _ISIN_KEY_MAX keys. Both lanes
    must yield the identical ranking and bit-identical scores."""
    from rifflux_spark.operators import bm25 as bm25mod

    probes = (
        (_rare_query(spark, store), CONFIG),
        (_stopword_query(spark, store), BUDGET),
    )

    def run():
        out = []
        for q, cfg in probes:
            rows = bm25mod.bm25_topk(
                spark, store, q, 10, cfg, prune=True, min_blocks_to_prune=1
            ).collect()
            out.append([(r["doc_ord"], r["bm25_score"]) for r in rows])
        return out

    monkeypatch.setattr(bm25mod, "_ISIN_KEY_MAX", 10**9)
    via_isin = run()
    monkeypatch.setattr(bm25mod, "_ISIN_KEY_MAX", 0)
    via_semijoin = run()
    assert via_isin == via_semijoin
    assert all(via_isin), "a probe returned nothing"


def test_keyfilter_semijoin_lane_is_broadcast(spark, store, monkeypatch) -> None:
    """Past the key cap the filter must plan as a BROADCAST left-semi
    join (the key frame is tiny), never a shuffled join of the postings
    table. The test corpus is too small to cross the cap naturally, so
    force the lane; the plan shape is key-count-independent."""
    from rifflux_spark.operators import bm25 as bm25mod
    from tests.test_physical_plans import explain_str

    import numpy as np

    q = _stopword_query(spark, store)
    blocks = store.postings_for_terms(sorted(set(q.split())))
    rows = blocks.select("term", "salt", "block_seq").limit(400).collect()
    terms = np.array([r["term"] for r in rows])
    salts = np.array([int(r["salt"]) for r in rows], dtype=np.int64)
    seqs = np.array([int(r["block_seq"]) for r in rows], dtype=np.int64)
    assert len(rows) > 50, "probe found almost no blocks"
    monkeypatch.setattr(bm25mod, "_ISIN_KEY_MAX", 0)
    filtered = bm25mod._filter_blocks_by_keys(
        spark, blocks, terms, salts, seqs, range(len(rows))
    )
    plan = explain_str(filtered)
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert filtered.count() == len(rows)


def test_prune_false_with_budget_matches_local_contract(spark, store) -> None:
    """prune=False + budget: an over-budget query still applies the
    budget (both engines agree on the doc set); an under-budget query
    is a straight full scan — _prune_blocks must be a no-op, mirroring
    the coordinator path's `not prune and not over_budget` branch."""
    from rifflux_spark.operators import bm25 as bm25mod
    from rifflux_spark.operators.local_exec import bm25_topk_local, local_df

    over_q = _stopword_query(spark, store)
    under_q = _rare_query(spark, store)
    assert sum(local_df(store, sorted(set(over_q.split()))).values()) > BUDGET.lexical_budget_postings
    assert sum(local_df(store, sorted(set(under_q.split()))).values()) <= BUDGET.lexical_budget_postings

    for q in (over_q, under_q):
        got_local = bm25_topk_local(
            store, q, top_k=10, config=BUDGET, prune=False, min_blocks_to_prune=1
        )
        got_spark = [
            (r["doc_ord"], r["bm25_score"])
            for r in bm25mod.bm25_topk(
                spark, store, q, 10, BUDGET, prune=False, min_blocks_to_prune=1
            ).collect()
        ]
        assert [d for d, _ in got_spark] == [d for d, _ in got_local], q
        assert all(
            abs(a[1] - b[1]) < 1e-9 for a, b in zip(got_spark, got_local)
        ), q

    # under budget + prune=False: no block filter may be applied — the
    # plan must be the plain posting scan (no semi-join, no In on the
    # synthetic key column)
    blocks, ranges = bm25mod._prune_blocks(
        store.postings_for_terms(sorted(set(under_q.split()))),
        {t: 1.0 for t in set(under_q.split())},
        10,
        100.0,
        BUDGET,
        min_blocks_to_prune=1,
        store=store,
        prune=False,
    )
    assert ranges is None
    from tests.test_physical_plans import explain_str

    plan = explain_str(blocks)
    assert "LeftSemi" not in plan and "concat_ws" not in plan
