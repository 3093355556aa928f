"""Learned-cost join-order hints — SURVEY §7(b), the one place a
custom optimizer extension is clearly warranted on top of Catalyst.

The reference's estimator exists to PREDICT runtimes; the natural
closing of the loop is to let those predictions pick the plan. Without
CBO statistics Catalyst largely preserves the written order of inner
joins (``ReorderJoin`` only rotates joinable pairs into a left-deep
chain in encounter order), so re-emitting a ``Query`` with a different
FROM-clause order IS a join-order hint — no engine patch required, and
the estimator scores each candidate from the encoded plan Catalyst
actually produces for it (``engine.estimate``), so what is compared is
exactly what would run.

At 100 TB this is the difference between starting the join chain from
the 10 B-row fact table or from the 100-row filtered dimension; the
candidate set stays tiny (≤ ``limit`` emissions), scoring is pure
driver-side inference (one plan analysis + one model forward each,
~50 ms), and the chosen SQL runs unmodified through the normal path.
"""

from __future__ import annotations

import itertools
import random

from deep_query_optimization_spark.generator.augment import _emit
from deep_query_optimization_spark.relational.query import Query


def order_variants(query: Query, limit: int = 6, seed: int = 0) -> list[str]:
    """Up to ``limit`` distinct emissions of ``query`` differing only
    in FROM-clause (= initial join) order; the canonical emission is
    always first. Predicates stay in canonical order and operands are
    never flipped, so the ONLY degree of freedom is join order."""
    aliases = query._aliases()
    rels = sorted(query.relations)
    n_preds = len(query.joins) + len(query.conditions)
    orders = list(itertools.permutations(rels))
    if len(orders) > limit:
        rng = random.Random(seed)
        orders = [orders[0]] + rng.sample(orders[1:], limit - 1)
    out: list[str] = []
    seen: set[str] = set()
    for order in orders:
        sql = _emit(query, list(order), list(range(n_preds)), 0, aliases)
        if sql not in seen:
            seen.add(sql)
            out.append(sql)
    return out


def reorder_by_estimate(
    engine, query: Query, limit: int = 6, seed: int = 0, margin: float = 1.0
) -> tuple[str, list[tuple[float, str]]]:
    """Pick the cheapest-estimated join order for ``query``.

    Returns (chosen_sql, [(estimate_s, sql), ...] for every candidate —
    candidates in emission order, chosen = argmin estimate; ties keep
    the earlier (canonical) emission so the hint never churns plans
    without a predicted win.

    ``margin`` is the confidence gate: override Catalyst's default
    order only when the best candidate's estimate is at most
    ``margin * estimate(default)``. At 1.0 every predicted win is
    taken; measured end-to-end (reports/learned_hints_sf1.json) the
    estimator's small predicted deltas on sub-second queries are noise,
    so production callers should demand a real predicted gap (~0.6) —
    the same reasoning as Spark's own broadcast threshold: act only
    when the signal clears the cost of being wrong."""
    scored = [(engine.estimate(sql), sql) for sql in order_variants(query, limit, seed)]
    best = min(range(len(scored)), key=lambda i: scored[i][0])
    if scored[best][0] > margin * scored[0][0]:
        best = 0
    return scored[best][1], scored
