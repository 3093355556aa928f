"""Runtime → log2 bucket partitioning.

Reference ``dqo/query_generator/rl/partitioner.py:31-52``
(``Log2Partitioner``): runtime t → bucket ``int(log2(t))`` clipped to
the configured range; bucket p → bounds ``(2^(p-1), 2^p]``. The labeled
datasets clip to [-3, 8] (``dqo/datasets/__init__.py:140``).
"""

from __future__ import annotations

import math


class Log2Partitioner:
    def __init__(self, low: int = -3, high: int = 8) -> None:
        self.low = low
        self.high = high

    @property
    def buckets(self) -> list[int]:
        return list(range(self.low, self.high + 1))

    def bucket(self, runtime_s: float) -> int:
        """Exact inverse of ``bounds``: t ∈ (2^(b-1), 2^b] → b. A
        ``round`` here would credit runtimes in (2^(b-1), 2^(b-0.5)) to
        bucket b-1 while the guided target accepts them for bucket b,
        skewing BalancedQueryGen's histogram."""
        if runtime_s <= 0:
            return self.low
        return int(min(self.high, max(self.low, math.ceil(math.log2(runtime_s)))))

    def bounds(self, bucket: int) -> tuple[float, float]:
        """(lo, hi] runtime bounds of a bucket (reference :43-52)."""
        return (2.0 ** (bucket - 1), 2.0**bucket)
