"""Workload-generator tests with a fake runner (reference style:
seeded-random generation + FakeClient policy tests,
``dqo/query_generator/tests/``)."""

from __future__ import annotations

import math
from pathlib import Path

import pytest

from deep_query_optimization_spark.catalog import Database
from deep_query_optimization_spark.generator import RandomQueryGen
from deep_query_optimization_spark.generator.augment import permutations
from deep_query_optimization_spark.generator.guided import BalancedQueryGen, GuidedQueryGen
from deep_query_optimization_spark.generator.partitioner import Log2Partitioner
from deep_query_optimization_spark.generator.rl import EpisodicQueryGen, QueryEnv, SarsaAgent

SNAPSHOT = Path(__file__).resolve().parent.parent / "deep_query_optimization_spark/snapshots/sf0.01_schema.json"


@pytest.fixture(scope="module")
def db() -> Database:
    return Database.load(str(SNAPSHOT))


class FakeRunner:
    """Runtime model: more relations/conditions → longer/shorter.
    Mirrors the FakeClient stub idea (``dqo/db/clients/fake.py:8-41``)."""

    def __init__(self) -> None:
        self.calls: list[str] = []

    def __call__(self, sql: str) -> float:
        self.calls.append(sql)
        joins = sql.count(" = t")
        conds = sql.count(" WHERE ") and len(sql.split(" WHERE ")[1].split(" AND "))
        base = 0.2 * (1 + sql.count(","))
        return max(0.01, base * (1 + joins) / (1 + 0.3 * conds))


def test_random_gen_deterministic(db):
    a = RandomQueryGen(db, seed=42).randomize()
    b = RandomQueryGen(db, seed=42).randomize()
    assert a.to_sql() == b.to_sql()
    c = RandomQueryGen(db, seed=43).randomize()
    assert a.to_sql() != c.to_sql()  # astronomically unlikely to collide


def test_random_gen_valid_queries(db):
    for seed in range(30):
        q = RandomQueryGen(db, seed=seed).randomize()
        assert q.valid(), f"seed {seed} invalid: {q.to_sql()}"
        sql = q.to_sql()
        assert sql.startswith("SELECT MIN(") or sql.startswith("SELECT ")


def test_random_gen_projection_type_restriction(db):
    from deep_query_optimization_spark.catalog import DataType

    for seed in range(20):
        gen = RandomQueryGen(db, seed=seed, projection_types=(DataType.NUMBER, DataType.FLOAT))
        q = gen.randomize()
        assert all(p.column.dtype in (DataType.NUMBER, DataType.FLOAT) for p in q.projections)


def test_log2_partitioner():
    p = Log2Partitioner(-3, 8)
    assert p.bucket(1.0) == 0
    assert p.bucket(0.001) == -3  # clipped
    assert p.bucket(10_000) == 8  # clipped
    assert p.bucket(5.0) == math.ceil(math.log2(5.0))
    lo, hi = p.bounds(3)
    assert (lo, hi) == (4.0, 8.0)


def test_log2_bucket_is_inverse_of_bounds():
    """Every runtime inside bounds(b) must be credited to bucket b —
    round(log2 t) credited (2^(b-1), 2^(b-0.5)) to b-1, skewing the
    BalancedQueryGen histogram vs the guided target."""
    p = Log2Partitioner(-3, 8)
    for b in p.buckets:
        lo, hi = p.bounds(b)
        for t in (lo * 1.0001, (lo + hi) / 2, lo * 1.3, hi):
            assert p.bucket(t) == b, (b, t)


def test_guided_gen_converges_with_fake_runner(db):
    runner = FakeRunner()
    gen = GuidedQueryGen(db, runner, target_lo=0.05, target_hi=1.0, seed=5, max_steps=40)
    result = gen.generate()
    assert result is not None
    query, runtime = result
    assert 0.05 <= runtime <= 1.0
    assert query.valid()


def test_guided_step_returns_executed_query(db):
    """step() must pair the runtime with the query that actually ran —
    the pre-mutation query — or every (sql, runtime) training row
    recorded by BalancedQueryGen is mislabeled."""
    runner = FakeRunner()
    gen = GuidedQueryGen(db, runner, target_lo=1e-6, target_hi=1e-5, seed=11, max_steps=25)
    gen.randomize_initial()
    for _ in range(25):
        query, runtime, hit = gen.step()
        assert runner(query.to_sql()) == runtime, "runtime paired with wrong query"
        if hit:
            break


def test_balanced_gen_rows_correctly_labeled(db):
    runner = FakeRunner()
    gen = BalancedQueryGen(db, runner, seed=3, queue_size=3, patience=10)
    rows = gen.generate(25)
    mislabeled = [sql for sql, rt in rows if runner(sql) != rt]
    assert not mislabeled, f"{len(mislabeled)}/25 rows mislabeled"


def test_condition_selectivity_estimates(db):
    """Histogram-based per-condition selectivity drives guided
    mutations: range conditions order by value, LIKE by pattern
    rarity, null checks by null fraction."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.generator.conditions import condition_selectivity
    from deep_query_optimization_spark.relational.models import ColumnRef, Condition, TableRef

    o = TableRef("orders")
    price = ColumnRef(o, "o_totalprice", DataType.FLOAT)
    ns = db["orders"]["o_totalprice"].stats.values
    low = Condition(price, "<", ns.min + (ns.max - ns.min) * 0.1)
    high = Condition(price, "<", ns.min + (ns.max - ns.min) * 0.9)
    assert condition_selectivity(db, low) < condition_selectivity(db, high)

    pri = ColumnRef(o, "o_orderpriority", DataType.STRING)
    assert condition_selectivity(db, Condition(pri, "LIKE", "%e%")) > condition_selectivity(
        db, Condition(pri, "LIKE", "%qzx%")
    )
    assert condition_selectivity(db, Condition(pri, "IS NOT NULL")) >= 0.9


def test_selectivity_aware_mutations(db):
    """With selectivity_aware ON, remove_condition drops the most
    restrictive predicate — the broadening move with the largest
    expected runtime increase."""
    import random

    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.generator.conditions import condition_selectivity
    from deep_query_optimization_spark.relational.builder import QueryBuilder
    from deep_query_optimization_spark.relational.models import ColumnRef, Condition, Projection, TableRef

    o = TableRef("orders")
    price = ColumnRef(o, "o_totalprice", DataType.FLOAT)
    ns = db["orders"]["o_totalprice"].stats.values
    tight = Condition(price, "<", ns.min + (ns.max - ns.min) * 0.05)
    loose = Condition(price, ">", ns.min + (ns.max - ns.min) * 0.05)
    b = QueryBuilder(db, rng=random.Random(0))
    b.selectivity_aware = True
    b.query.add_projection(Projection(ColumnRef(o, "o_orderkey", DataType.NUMBER)))
    b.query.add_condition(tight)
    b.query.add_condition(loose)
    assert condition_selectivity(db, tight) < condition_selectivity(db, loose)
    assert b.remove_condition()
    assert tight not in b.query.conditions and loose in b.query.conditions


@pytest.mark.skipif(
    not __import__("os").environ.get("DQO_SLOW"),
    reason="live sf0.1 bucket-fill integration (minutes); set DQO_SLOW=1",
)
def test_balanced_gen_fills_buckets_live_sf01(spark):
    """BalancedQueryGen against live Spark at sf0.1 occupies >=5 log2
    runtime buckets within a bounded time budget — the spread the
    estimator comparison needs (VERDICT r1 #7). The default-suite twin
    of this check is the committed artifact reports/report.json from
    tools/train_estimator.py."""
    from deep_query_optimization_spark.engine import DQOEngine
    from deep_query_optimization_spark.generator.guided import BalancedQueryGen
    from deep_query_optimization_spark.generator.partitioner import Log2Partitioner
    from deep_query_optimization_spark.estimator.metrics import bucketize

    eng = DQOEngine(spark, "/root/testdata/sf0.1")
    db_live = eng.snapshot()
    eng.runner.timeout_s = 25
    bal = BalancedQueryGen(db_live, eng.runner.time, partitioner=Log2Partitioner(-3, 2), seed=42)
    rows = bal.generate(150, time_budget_s=360)
    occupied = {bucketize(rt) for _, rt in rows}
    assert len(occupied) >= 5, f"only {sorted(occupied)} occupied after {len(rows)} rows"


def test_guided_gen_memoizes(db):
    runner = FakeRunner()
    gen = GuidedQueryGen(db, runner, target_lo=0.0, target_hi=100.0, seed=5)
    gen.randomize_initial()
    gen.run_query()
    n = len(runner.calls)
    gen.run_query()
    assert len(runner.calls) == n  # memo hit


def test_balanced_gen_fills_histogram(db):
    runner = FakeRunner()
    bal = BalancedQueryGen(db, runner, partitioner=Log2Partitioner(-3, 1), seed=11, patience=10)
    rows = bal.generate(25)
    assert len(rows) >= 25
    assert sum(bal.histogram.values()) >= 25
    assert all(isinstance(s, str) and isinstance(r, float) for s, r in rows)
    # checkpoint/restore round-trip
    state = bal.state()
    bal2 = BalancedQueryGen(db, runner, partitioner=Log2Partitioner(-3, 1), seed=12)
    bal2.restore(state)
    assert bal2.histogram == bal.histogram
    assert bal2.dataset == bal.dataset


def test_balanced_gen_out_of_band_not_credited(db):
    """A banded window (count_out_of_band=False) must add out-of-band
    rows to the dataset but NOT to the fill histogram: the default
    clamp credits every undershoot to bucket `low`, inflating its fill
    with rows that are not in (2^(low-1), 2^low] and starving it of
    rargmin targeting (the r12 sf10 mid-band window saw bucket 4 at a
    displayed fill of 14 with only 4 true (8,16] s rows)."""
    runner = FakeRunner()  # FakeRunner yields ~0.01-2 s runtimes
    bal = BalancedQueryGen(
        db,
        runner,
        partitioner=Log2Partitioner(4, 8),
        seed=5,
        patience=5,
        count_out_of_band=False,
    )
    bal.generate(10, time_budget_s=5)
    assert len(bal.dataset) >= 10  # rows still recorded
    in_band = [
        rt for _, rt in bal.dataset if 4 <= max(-3, min(8, math.ceil(math.log2(rt)))) <= 8
    ]
    assert sum(bal.histogram.values()) == len(in_band)
    # default behavior unchanged: everything clamps into the band
    bal2 = BalancedQueryGen(db, runner, partitioner=Log2Partitioner(4, 8), seed=5, patience=5)
    bal2.generate(10, time_budget_s=5)
    assert sum(bal2.histogram.values()) == len(bal2.dataset)


def test_seed_candidate_hygiene(db):
    """Censor clips and above-window rows must be excludable from seed
    candidacy. A row recorded at the watchdog cap has an
    unknown-greater true runtime, so the 'within 2 buckets of the
    window' proximity _seed_candidates assumes is false — and one
    mutation step from it costs up to the full cap x2 under double-run
    (the r12 520s-cap sf10 window lost 23 min to a single climb seeded
    from a 185s censor clip of an earlier window's cap)."""
    runner = FakeRunner()
    dataset = [
        ("q_below", 30.0),  # (lo/4, lo) for the bucket-7 window
        ("q_above_real", 200.0),  # (hi, hi*4) — a genuine label
        ("q_censor", 500.0),  # at >=95% of this run's 520 s cap
    ]

    def mk(**kw):
        bal = BalancedQueryGen(
            db, runner, partitioner=Log2Partitioner(4, 8), seed=1, **kw
        )
        bal.restore({"histogram": {}, "dataset": list(dataset)})
        return bal

    lo, hi = 64.0, 128.0
    # permissive default — the historical behavior — keeps everything
    assert {s for s, _ in mk()._seed_candidates(lo, hi)} == {
        "q_below", "q_above_real", "q_censor",
    }
    # censor_ceiling (0.95 x this run's cap) drops the clip only
    assert {s for s, _ in mk(censor_ceiling=0.95 * 520.0)._seed_candidates(lo, hi)} == {
        "q_below", "q_above_real",
    }
    # below-only seeding drops the whole above-window side (historical
    # censors from earlier caps are indistinguishable from real labels)
    assert {s for s, _ in mk(seed_from_above=False)._seed_candidates(lo, hi)} == {
        "q_below",
    }


def test_rl_env_and_agent(db):
    runner = FakeRunner()
    env = QueryEnv(db, runner, target_bucket=-2, seed=3)
    state = env.reset()
    assert len(state) == 3
    s2, reward, done, runtime = env.step("add_condition")
    assert runtime > 0
    assert reward == 1000.0 or reward < 0
    agent = SarsaAgent(seed=1)
    a = agent.act(state)
    assert a in QueryEnv.__annotations__ or isinstance(a, str)
    agent.update(state, a, reward, s2, agent.act(s2))
    assert agent.q[state][a] != 0.0


def test_episodic_gen_harvests_dataset(db):
    runner = FakeRunner()
    gen = EpisodicQueryGen(db, runner, partitioner=Log2Partitioner(-2, 0), seed=9)
    rows = gen.generate(episodes_per_bucket=1)
    assert len(rows) > 0
    assert all(r > 0 for _, r in rows)


def test_augment_permutations_equivalent(db):
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Condition,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER)))
    q.add_condition(Condition(ColumnRef(o, "o_totalprice", DataType.FLOAT), ">", 1000.0))
    variants = permutations(q, limit=8, seed=0)
    assert variants[0] == q.to_sql()
    assert len(set(variants)) == len(variants)
    assert len(variants) >= 4  # 2 rel orders × 2 pred orders × flips
    for v in variants:
        assert v.startswith("SELECT")
        assert v.count("FROM") == 1


def test_augment_degenerate_single_emission(db):
    # 1 relation + 1 LIKE predicate: nothing to permute or flip
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Condition,
        Projection,
        Query,
        TableRef,
    )

    p = TableRef("part")
    q = Query()
    q.add_projection(Projection(ColumnRef(p, "p_partkey", DataType.NUMBER), "MIN"))
    q.add_condition(Condition(ColumnRef(p, "p_name", DataType.STRING), "LIKE", "%x%"))
    assert permutations(q, limit=8, seed=0) == [q.to_sql()]


def test_hints_order_variants_and_choice(db):
    """plans.hints: FROM-order variants differ ONLY in join order, the
    canonical emission is first, and reorder_by_estimate picks the
    argmin-estimate variant (fake estimator keyed on emission order)."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import order_variants, reorder_by_estimate
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Condition,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o, c = TableRef("lineitem"), TableRef("orders"), TableRef("customer")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER)))
    q.add_join(Join(ColumnRef(o, "o_custkey", DataType.NUMBER), ColumnRef(c, "c_custkey", DataType.NUMBER)))
    q.add_condition(Condition(ColumnRef(c, "c_acctbal", DataType.FLOAT), ">", 100.0))

    variants = order_variants(q, limit=6)
    assert variants[0] == q.to_sql()
    assert len(variants) == 6  # 3! orderings of the FROM clause
    assert len(set(variants)) == 6
    # join-order-only: same predicates in every variant, same SELECT list
    select, where = variants[0].split(" FROM ")[0], variants[0].split(" WHERE ")[1]
    for v in variants[1:]:
        assert v.split(" FROM ")[0] == select
        assert v.split(" WHERE ")[1] == where

    class FakeEngine:
        def __init__(self, costs):
            self.costs = costs

        def estimate(self, sql):
            return self.costs[sql]

    costs = {sql: float(i) for i, sql in enumerate(variants)}
    costs[variants[3]] = -1.0  # cheapest
    chosen, scored = reorder_by_estimate(FakeEngine(costs), q, limit=6)
    assert chosen == variants[3]
    assert len(scored) == 6


def test_hints_margin_by_bucket_gates_override(db):
    """Per-bucket margins: a low-reliability bucket demands a bigger
    predicted win before the default order is overridden."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import (
        margins_from_calibration,
        order_variants,
        reorder_by_estimate,
    )
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(
        Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER))
    )
    variants = order_variants(q, limit=2)
    assert len(variants) == 2

    class FakeEngine:
        def __init__(self, costs):
            self.costs = costs

        def estimate(self, sql):
            return self.costs[sql]

    # default estimated 2.0s (bucket 1), candidate 1.5s: a 0.9 margin
    # takes the override, a strict 0.5 margin for bucket 1 rejects it
    costs = {variants[0]: 2.0, variants[1]: 1.5}
    chosen, _ = reorder_by_estimate(FakeEngine(costs), q, limit=2, margin=0.9)
    assert chosen == variants[1]
    chosen, _ = reorder_by_estimate(
        FakeEngine(costs), q, limit=2, margin=0.9, margin_by_bucket={1: 0.5}
    )
    assert chosen == variants[0]

    # margins_from_calibration: reliable buckets get looser margins,
    # unreliable tighter, n<5 buckets are skipped
    calib = {
        "per_bucket": {
            "-3": {"n": 97, "bucket_accuracy": 0.8},
            "1": {"n": 15, "bucket_accuracy": 0.2},
            "5": {"n": 1, "bucket_accuracy": 0.0},
        }
    }
    m = margins_from_calibration(calib, base=0.6)
    assert m[-3] > m[1]
    assert 5 not in m
    assert all(0.1 <= v <= 0.9 for v in m.values())

    # reorder_by_estimate keys margins by the default plan's PREDICTED
    # bucket, so when the report carries the precision table
    # (per_bucket_predicted) it must win over the recall table
    calib["per_bucket_predicted"] = {
        "-3": {"n": 20, "bucket_accuracy": 0.1},
        "2": {"n": 50, "bucket_accuracy": 0.9},
    }
    mp = margins_from_calibration(calib, base=0.6)
    assert set(mp) == {-3, 2}
    assert mp[2] > mp[-3]  # precision numbers, not the recall ones
    assert mp[-3] < m[-3]  # same bucket, different table -> different margin


def test_hints_abstain_on_uncalibrated_bucket(db):
    """With margin_by_bucket set, a candidate predicted into a bucket
    the calibration table has never measured keeps the canonical order
    (abstain) instead of falling back to the flat margin — for BOTH the
    default's and the best candidate's predicted bucket."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import order_variants, reorder_by_estimate
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(
        Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER))
    )
    variants = order_variants(q, limit=2)

    class FakeEngine:
        def __init__(self, costs):
            self.costs = costs

        def estimate(self, sql):
            return self.costs[sql]

    # default 32s (bucket 5), candidate 2s (bucket 1): a huge predicted
    # win, and the flat margin would take it — but bucket 5 has no
    # calibration row, so the gate abstains and keeps the default
    costs = {variants[0]: 32.0, variants[1]: 2.0}
    chosen, _ = reorder_by_estimate(
        FakeEngine(costs), q, limit=2, margin=0.9, margin_by_bucket={1: 0.6, 2: 0.6}
    )
    assert chosen == variants[0]

    # the BEST candidate's bucket uncalibrated also abstains, even when
    # the default's bucket is in the table
    costs = {variants[0]: 2.0, variants[1]: 0.01}
    chosen, _ = reorder_by_estimate(
        FakeEngine(costs), q, limit=2, margin=0.9, margin_by_bucket={1: 0.6, 2: 0.6}
    )
    assert chosen == variants[0]

    # both buckets calibrated -> the override proceeds as before
    costs = {variants[0]: 32.0, variants[1]: 2.0}
    chosen, _ = reorder_by_estimate(
        FakeEngine(costs), q, limit=2, margin=0.9, margin_by_bucket={1: 0.6, 5: 0.6}
    )
    assert chosen == variants[1]

    # abstain_uncalibrated=False restores the flat-margin fallback
    chosen, _ = reorder_by_estimate(
        FakeEngine(costs),
        q,
        limit=2,
        margin=0.9,
        margin_by_bucket={1: 0.6, 2: 0.6},
        abstain_uncalibrated=False,
    )
    assert chosen == variants[1]


def test_broadcast_by_stats_hints_filtered_relation(db):
    """broadcast_by_stats fires exactly when the POST-FILTER estimate
    clears the budget on a relation whose RAW size does not — and never
    for the largest relation of the query."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import (
        broadcast_by_stats,
        condition_selectivity,
        estimate_filtered_bytes,
    )
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Condition,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(
        Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER))
    )
    # selective filter on orders: o_orderkey < small literal
    cond = Condition(ColumnRef(o, "o_orderkey", DataType.NUMBER), "<", 500.0)
    q.add_condition(cond)

    sel = condition_selectivity(db, cond)
    assert 0.0 < sel < 0.5  # histogram says the filter is selective

    raw, est = estimate_filtered_bytes(db, q, o)
    assert raw == db["orders"].stats.bytes
    assert est == pytest.approx(raw * sel)

    # thresholds scaled to the sf0.01 snapshot (orders raw = ~272 KB):
    # raw clears the auto floor, raw itself would NOT fit the margin
    # budget, the filtered estimate does -> hint fires on orders only
    auto = 100_000
    threshold = int(raw * 1.2)
    sql, decisions = broadcast_by_stats(db, q, threshold_bytes=threshold, margin=0.5, auto_bytes=auto)
    byname = {d["table"]: d for d in decisions}
    assert byname["orders"]["hinted"] is True
    assert byname["lineitem"]["hinted"] is False  # largest side, never hinted
    assert sql.startswith("SELECT /*+ BROADCAST(")
    assert sql.replace(f"/*+ BROADCAST({byname['orders']['alias']}) */ ", "") == q.to_sql()

    # without the filter the raw size blows the budget -> no hint
    q.remove_condition(cond)
    sql2, decisions2 = broadcast_by_stats(
        db, q, threshold_bytes=threshold, margin=0.5, auto_bytes=auto
    )
    assert sql2 == q.to_sql()
    assert not any(d["hinted"] for d in decisions2)


def test_balanced_gen_never_rerecords_restored_rows(db):
    """Resume must not duplicate rows: generate() seeds its dedup set
    from the restored dataset, so a restarted generator with the same
    seed re-executes early queries without recording them twice — a
    duplicated SQL that later splits across train/test is a leak."""
    runner = FakeRunner()
    first = BalancedQueryGen(db, runner, seed=9, queue_size=3, patience=10)
    rows = first.generate(15)

    resumed = BalancedQueryGen(db, runner, seed=9, queue_size=3, patience=10)
    resumed.restore(first.state())
    resumed.generate(30)
    sqls = [sql for sql, _ in resumed.dataset]
    assert len(sqls) == len(set(sqls)), "resume re-recorded restored SQLs"
    assert len(resumed.dataset) >= 30
    # batched continuation within one instance must not duplicate either
    resumed.generate(40)
    sqls = [sql for sql, _ in resumed.dataset]
    assert len(sqls) == len(set(sqls))


def test_hints_min_gain_floor_gates_cheap_overrides(db):
    """Absolute expected-gain floor: a big RATIO win on a tiny estimate
    is noise (measured hint suite: every regression was a sub-second
    query whose predicted delta sat under the estimator's MAE), so
    min_gain_s must keep the default; the same ratio at a scale where
    the delta clears the floor must still override."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import (
        order_variants,
        reorder_by_estimate,
    )
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(
        Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER))
    )
    variants = order_variants(q, limit=2)

    class FakeEngine:
        def __init__(self, costs):
            self.costs = costs

        def estimate(self, sql):
            return self.costs[sql]

    # 2x ratio win, but only 30 ms absolute: floor rejects, no floor takes
    cheap = FakeEngine({variants[0]: 0.06, variants[1]: 0.03})
    chosen, _ = reorder_by_estimate(cheap, q, limit=2, margin=0.6, min_gain_s=0.25)
    assert chosen == variants[0]
    chosen, _ = reorder_by_estimate(cheap, q, limit=2, margin=0.6)
    assert chosen == variants[1]

    # same 2x ratio at 6 s: the 3 s predicted gain clears any sane floor
    dear = FakeEngine({variants[0]: 6.0, variants[1]: 3.0})
    chosen, _ = reorder_by_estimate(dear, q, limit=2, margin=0.6, min_gain_s=0.25)
    assert chosen == variants[1]


def test_broadcast_min_probe_floor_gates_small_queries(db):
    """Stakes floor: with min_probe_bytes above the probe (largest)
    relation's size, no hint fires even when a filtered side fits the
    broadcast budget — the saved shuffle could not clear the broadcast
    build cost. Same query with the floor below the probe still hints."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import (
        broadcast_by_stats,
        estimate_filtered_bytes,
    )
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Condition,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "MIN"))
    q.add_join(
        Join(ColumnRef(li, "l_orderkey", DataType.NUMBER), ColumnRef(o, "o_orderkey", DataType.NUMBER))
    )
    q.add_condition(Condition(ColumnRef(o, "o_orderkey", DataType.NUMBER), "<", 500.0))

    raw, _ = estimate_filtered_bytes(db, q, o)
    probe_raw = db["lineitem"].stats.bytes
    auto, threshold = 100_000, int(raw * 1.2)

    sql, decisions = broadcast_by_stats(
        db, q, threshold_bytes=threshold, margin=0.5, auto_bytes=auto,
        min_probe_bytes=probe_raw + 1,
    )
    assert not any(d["hinted"] for d in decisions)
    assert sql == q.to_sql()
    assert len(decisions) == 2  # still records sizes for the report

    sql2, decisions2 = broadcast_by_stats(
        db, q, threshold_bytes=threshold, margin=0.5, auto_bytes=auto,
        min_probe_bytes=probe_raw,
    )
    assert any(d["hinted"] for d in decisions2)
    assert sql2.startswith("SELECT /*+ BROADCAST(")


def test_balanced_gen_seeds_from_near_target_rows(db):
    """With a seed_parser, spawns targeting a starved bucket start from
    a parsed near-target dataset row (pre-memoized, so re-timing it is
    free) instead of from a random query."""
    from deep_query_optimization_spark.relational.query import Query

    parsed: list[str] = []

    def fake_parser(sql: str) -> Query:
        parsed.append(sql)
        # a genuine Query the builder can mutate: regenerate from seed
        return RandomQueryGen(db, seed=99).randomize()

    runner = FakeRunner()
    bal = BalancedQueryGen(
        db,
        runner,
        partitioner=Log2Partitioner(-3, 2),
        seed=11,
        seed_parser=fake_parser,
        seed_prob=1.0,
    )
    # restore a dataset with rows one bucket outside the [2,4)s window
    # of bucket 1 — candidates for seeding when bucket 1 is targeted
    bal.restore(
        {
            "histogram": {-3: 5, -2: 5, -1: 5, 0: 5, 1: 0, 2: 5},
            "dataset": [("SELECT 1", 1.1), ("SELECT 2", 5.0), ("SELECT 3", 0.01)],
        }
    )
    bal.generate(8, time_budget_s=5.0)
    assert parsed, "seed_parser was never consulted"
    # only near-target rows qualify: the 0.01s row is >2 buckets away
    assert all(sql in ("SELECT 1", "SELECT 2") for sql in parsed)


def test_seed_candidates_exclude_in_window(db):
    runner = FakeRunner()
    bal = BalancedQueryGen(db, runner, seed=3)
    bal.dataset = [("a", 1.0), ("b", 2.5), ("c", 5.0), ("d", 30.0)]
    # window [2, 4): 'b' is inside (excluded), 'a' and 'c' within 2
    # buckets outside, 'd' too far
    cands = bal._seed_candidates(2.0, 4.0)
    assert [s for s, _ in cands] == ["a", "c"]


def test_unparseable_seed_falls_back_to_random(db):
    def bad_parser(sql: str):
        raise ValueError("nope")

    runner = FakeRunner()
    bal = BalancedQueryGen(
        db, runner, partitioner=Log2Partitioner(-3, 2), seed=11,
        seed_parser=bad_parser, seed_prob=1.0,
    )
    bal.restore(
        {
            "histogram": {-3: 5, -2: 5, -1: 5, 0: 5, 1: 0, 2: 5},
            "dataset": [("SELECT 1", 1.1)],
        }
    )
    rows = bal.generate(8, time_budget_s=5.0)
    assert len(rows) >= 6  # generation proceeded on random starts


def test_balanced_gen_survives_failing_steps(db):
    """A step that raises (executor OOM on a pathological join) drops
    its generator and the loop continues; only a consecutive-failure
    streak (dead backend) re-raises."""
    calls = [0]

    def flaky(sql: str) -> float:
        calls[0] += 1
        if calls[0] % 3 == 0:
            raise RuntimeError("UNABLE_TO_ACQUIRE_MEMORY")
        return 0.05

    bal = BalancedQueryGen(db, flaky, partitioner=Log2Partitioner(-3, 0), seed=5)
    rows = bal.generate(10, time_budget_s=10.0)
    assert len(rows) >= 8  # progressed past the sprinkled failures


def test_balanced_gen_stops_on_dead_backend(db):
    def dead(sql: str) -> float:
        raise RuntimeError("connection refused")

    bal = BalancedQueryGen(db, dead, partitioner=Log2Partitioner(-3, 0), seed=5)
    with pytest.raises(RuntimeError, match="connection refused"):
        bal.generate(10, time_budget_s=10.0)


def test_guided_moves_fine_near_target(db):
    runner = FakeRunner()
    gen = GuidedQueryGen(db, runner, target_lo=8.0, target_hi=16.0, seed=1)
    # far below target: full broadening arsenal (relations included)
    assert "add_relation" in gen._moves(0.1)
    # within 1.5 buckets below: condition-only nudges
    assert gen._moves(5.0) == ("remove_condition",)
    # within 1.5 buckets above: condition-only narrowing
    assert gen._moves(30.0) == ("add_condition",)
    # far above: full narrowing arsenal
    assert "remove_relation" in gen._moves(200.0)
    # inside the window: hit
    assert gen._moves(10.0) == ()


def test_builder_target_selectivity_picks_closest(db):
    from deep_query_optimization_spark.generator.conditions import condition_selectivity
    from deep_query_optimization_spark.relational.builder import QueryBuilder

    b = QueryBuilder(db, rng=__import__("random").Random(2))
    b.selectivity_aware = True
    gen = RandomQueryGen(db, seed=4)
    b.query = gen.randomize()
    # ensure there are conditions to remove
    while len(b.query.conditions) < 3:
        if not b.add_condition():
            break
    sels = {id(c): condition_selectivity(db, c) for c in b.query.conditions}
    if len(sels) >= 2 and len(set(round(s, 3) for s in sels.values())) >= 2:
        b.target_selectivity = 0.9  # want the mildest condition removed
        before = list(b.query.conditions)
        assert b.remove_condition()
        removed = [c for c in before if c not in b.query.conditions][0]
        closest = min(before, key=lambda c: abs(condition_selectivity(db, c) - 0.9))
        assert abs(condition_selectivity(db, removed) - condition_selectivity(db, closest)) < 1e-9


def test_guided_undo_on_worsening_resumes_from_predecessor(db):
    """A fine-range mutation that crashes the runtime is recorded but
    the SEARCH backtracks: the builder's query reverts to the
    predecessor (undo) instead of climbing back from the crash site."""

    class CrashyRunner:
        """First query ~20s (near target), mutated query crashes to 0.1s."""

        def __init__(self):
            self.n = 0

        def __call__(self, sql):
            self.n += 1
            return 20.0 if self.n == 1 else 0.1

    gen = GuidedQueryGen(db, CrashyRunner(), target_lo=32.0, target_hi=64.0, seed=9)
    gen.randomize_initial()
    q0 = gen.builder.query.copy().to_sql()
    gen.step()  # measures 20s (fine range below target) -> one mutation
    q1 = gen.builder.query.copy().to_sql()
    assert q1 != q0
    gen.step()  # measures 0.1s (crash) -> undo back to the 20s query
    # the search state resumed from the predecessor, not the crash site
    assert gen._prev is not None and gen._prev[0] == 20.0


def test_emit_group_by_parity_with_to_sql(db):
    """Every non-canonical emission of a mixed plain+aggregate
    projection query must carry the SAME GROUP BY clause Query.to_sql
    adds — round-9 advice (high): _emit omitting it made every
    order_variants candidate of such a query an AnalysisException, so
    the hint path could turn a runnable GROUP BY join unrunnable."""
    from deep_query_optimization_spark.catalog import DataType
    from deep_query_optimization_spark.plans.hints import order_variants
    from deep_query_optimization_spark.relational import (
        ColumnRef,
        Join,
        Projection,
        Query,
        TableRef,
    )

    li, o = TableRef("lineitem"), TableRef("orders")
    q = Query()
    q.add_projection(Projection(ColumnRef(o, "o_orderstatus", DataType.STRING)))
    q.add_projection(Projection(ColumnRef(li, "l_quantity", DataType.FLOAT), "SUM"))
    q.add_join(
        Join(
            ColumnRef(li, "l_orderkey", DataType.NUMBER),
            ColumnRef(o, "o_orderkey", DataType.NUMBER),
        )
    )
    canonical = q.to_sql()
    assert " GROUP BY " in canonical
    group_by = canonical.split(" GROUP BY ")[1]
    for sql in order_variants(q, limit=6) + permutations(q, limit=8, seed=0):
        assert sql.split(" GROUP BY ")[1] == group_by, sql


def test_log2_bucket_single_definition():
    """plans.hints.log2_bucket is THE bucket formula the gate keys on;
    engine.estimate_bucket and the report tools import it rather than
    re-deriving it (round-9 advice: three inline copies could drift)."""
    import inspect

    from deep_query_optimization_spark.plans.hints import log2_bucket

    assert log2_bucket(0.0) == -3  # clamp at the fast floor
    assert log2_bucket(0.125) == -3
    assert log2_bucket(1.0) == 0
    assert log2_bucket(45.0) == 5  # round(log2(45)) = round(5.49) = 5
    assert log2_bucket(300.0) == 8
    assert log2_bucket(1e9) == 8  # clamp at the slow ceiling
    # the other consumers import it instead of re-implementing
    import deep_query_optimization_spark.engine as eng
    import tools.hint_report as hr

    assert "log2_bucket" in inspect.getsource(eng.DQOEngine.estimate_bucket)
    assert "log2_bucket" in inspect.getsource(hr.main)
