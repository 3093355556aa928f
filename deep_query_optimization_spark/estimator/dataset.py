"""Labeled-workload datasets.

Reference ``dqo/datasets/__init__.py:36-267``: CSV files of
``("query", runtime)`` rows (``ExtendedQueriesDataset`` adds a third
``plan`` column); runtimes bucketed ``clip(round(log2(t)), -3, 8)``
(``:140``); stratified train/test splits by bucket (``:248-254``).
"""

from __future__ import annotations

import csv
import os
import random
from dataclasses import dataclass, field
from pathlib import Path

from deep_query_optimization_spark.estimator.metrics import bucketize


@dataclass
class QueriesDataset:
    rows: list[tuple[str, float, str]] = field(default_factory=list)  # (sql, runtime, plan_json)

    def add(self, sql: str, runtime: float, plan: str = "") -> None:
        self.rows.append((sql, runtime, plan))

    def buckets(self) -> list[int]:
        return [bucketize(r) for _, r, _ in self.rows]

    # -- CSV round trip (reference :44, :270) --------------------------

    def save(self, path: str) -> None:
        """Atomic write: a SIGKILL mid-save (the relabel wedge guard's
        pkill -9) must never leave a truncated checkpoint that a resumed
        run would silently treat as the full corpus. Write to a sibling
        temp file and os.replace() into place (atomic on POSIX)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        tmp = f"{path}.tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["query", "runtime", "plan"])
            w.writerows(self.rows)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "QueriesDataset":
        """Tolerates a torn final row (pre-atomic-save checkpoints may
        end mid-record): a last row that doesn't parse is dropped with
        a warning instead of crashing the resume."""
        with open(path, newline="") as f:
            raw = list(csv.reader(f))
        rows: list[tuple[str, float, str]] = []
        for i, rec in enumerate(raw[1:], start=2):
            try:
                q, t, p = rec
                rows.append((q, float(t), p))
            except ValueError:
                if i == len(raw):  # torn final row from a killed writer
                    print(f"warning: dropping torn final row in {path}")
                    break
                raise
        return cls(rows=rows)

    # -- splits --------------------------------------------------------

    def stratified_split(self, test_fraction: float = 0.2, seed: int = 0) -> tuple["QueriesDataset", "QueriesDataset"]:
        """Per-bucket split (reference ``save(split=True)``
        ``:248-254``): each log2 bucket contributes proportionally to
        the test set, so rare-runtime buckets appear in both halves."""
        rng = random.Random(seed)
        by_bucket: dict[int, list[int]] = {}
        for i, b in enumerate(self.buckets()):
            by_bucket.setdefault(b, []).append(i)
        test_idx: set[int] = set()
        for idxs in by_bucket.values():
            idxs = idxs[:]
            rng.shuffle(idxs)
            n_test = max(1, round(len(idxs) * test_fraction)) if len(idxs) > 1 else 0
            test_idx.update(idxs[:n_test])
        train = QueriesDataset([r for i, r in enumerate(self.rows) if i not in test_idx])
        test = QueriesDataset([r for i, r in enumerate(self.rows) if i in test_idx])
        return train, test

    def stratified_split_min(
        self,
        test_fraction: float = 0.2,
        min_test_per_bucket: int = 0,
        max_test_frac: float = 0.5,
        seed: int = 0,
    ) -> tuple["QueriesDataset", "QueriesDataset"]:
        """Per-bucket split with a floor on test rows per bucket.

        A proportional split starves exactly the buckets a macro-F1
        metric needs most: 15 % of a 60-row bucket is 9 test rows —
        too few to measure per-bucket accuracy. Each bucket contributes
        ``max(round(n*test_fraction), min_test_per_bucket)`` test rows,
        capped at ``max_test_frac`` of the bucket so scarce buckets
        still keep a training majority."""
        rng = random.Random(seed)
        by_bucket: dict[int, list[int]] = {}
        for i, b in enumerate(self.buckets()):
            by_bucket.setdefault(b, []).append(i)
        test_idx: set[int] = set()
        for idxs in by_bucket.values():
            idxs = idxs[:]
            rng.shuffle(idxs)
            if len(idxs) <= 1:
                continue
            n_test = max(round(len(idxs) * test_fraction), min_test_per_bucket)
            n_test = min(n_test, int(len(idxs) * max_test_frac))
            test_idx.update(idxs[:n_test])
        train = QueriesDataset([r for i, r in enumerate(self.rows) if i not in test_idx])
        test = QueriesDataset([r for i, r in enumerate(self.rows) if i in test_idx])
        return train, test

    def uniform_split(self, per_bucket: int, seed: int = 0) -> "QueriesDataset":
        """Bucket-balanced subsample (reference ``uniform_split:51``)."""
        rng = random.Random(seed)
        by_bucket: dict[int, list[int]] = {}
        for i, b in enumerate(self.buckets()):
            by_bucket.setdefault(b, []).append(i)
        keep: list[int] = []
        for idxs in by_bucket.values():
            idxs = idxs[:]
            rng.shuffle(idxs)
            keep.extend(idxs[:per_bucket])
        return QueriesDataset([self.rows[i] for i in sorted(keep)])

    def drop_cartesian(self) -> "QueriesDataset":
        """Filter queries whose SQL lacks any join/filter over multiple
        relations (reference filters cartesian products from training
        data, ``datasets/__init__.py:163-165``)."""
        out = []
        for sql, t, p in self.rows:
            n_rels = sql.split(" FROM ", 1)[-1].split(" WHERE ")[0].count(",") + 1 if " FROM " in sql else 1
            if n_rels > 1 and " WHERE " not in sql:
                continue
            out.append((sql, t, p))
        return QueriesDataset(out)
