"""Shared block-max WAND bound math for both execution paths.

The distributed plan (operators/bm25._prune_blocks) and the coordinator
short-circuit (operators/local_exec.bm25_topk_local) must prune with the
IDENTICAL upper-bound formula, seed-block selection, and keep test — a
drift between the two dialects silently desyncs their rankings. This
module is the single source of truth; each path supplies only its own
θ computation (a Spark job vs a numpy aggregation) and its own block
keying.

Bound: UB(B_t) = idf_t · wtf(block_max_tf, block_min_dl, avgdl) — wtf is
monotone ↑ in tf and ↓ in dl, so the block's stored extremes bound every
posting under the current corpus stats (codec.py docstring). A block
survives iff its own bound plus every other term's best-block bound can
reach θ (the k-th best seed score), or it is itself a seed block.
"""

from __future__ import annotations

import numpy as np

from rifflux_spark.operators.codec import bm25_wtf


def block_upper_bounds(
    terms: list[str],
    block_max_tf,
    block_min_dl,
    idf: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
) -> np.ndarray:
    """Per-block score upper bound, vectorized over all blocks at once."""
    wtf = bm25_wtf(
        np.asarray(block_max_tf, dtype=np.int64),
        np.asarray(block_min_dl, dtype=np.int64),
        avgdl,
        k1,
        b,
    )
    return np.array([idf[t] for t in terms]) * wtf


def seed_blocks_and_slack(
    terms: list[str], ub: np.ndarray, n_docs: list[int], top_k: int
) -> tuple[set[int], dict[str, float]]:
    """Seed selection + cross-term slack.

    Returns (seed block indices, total_other): seeds are each term's
    highest-UB blocks until they cover ≥ top_k docs (their full scores
    establish θ); total_other[t] = Σ over other terms of their best block
    bound — the most any doc outside block B_t's term can add.
    """
    max_ub: dict[str, float] = {}
    for t, u in zip(terms, ub):
        max_ub[t] = max(max_ub.get(t, 0.0), float(u))
    total_other = {t: sum(v for s, v in max_ub.items() if s != t) for t in max_ub}

    per_term: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        per_term.setdefault(t, []).append(i)
    seed: set[int] = set()
    for t, idxs in per_term.items():
        idxs.sort(key=lambda i: -ub[i])
        covered = 0
        for i in idxs:
            seed.add(i)
            covered += int(n_docs[i])
            if covered >= top_k:
                break
    return seed, total_other


def keep_indices(
    terms: list[str],
    ub: np.ndarray,
    seed: set[int],
    total_other: dict[str, float],
    theta: float,
) -> list[int]:
    """Block indices that survive pruning under threshold θ."""
    return [
        i
        for i in range(len(terms))
        if i in seed or (float(ub[i]) + total_other[terms[i]]) >= theta
    ]
