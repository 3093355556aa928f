"""RL-based workload generation: SARSA over query mutations.

Reference ``dqo/query_generator/rl/__init__.py:34-126`` (k agents, one
per runtime bucket), ``rl/agent.py:21-138`` (tabular SARSA), and
``rl/envs/db_env_v2.py:25-187`` (gym Env whose actions are the builder
mutations; reward 1000 on hitting the target bucket, else
``-(bucket_distance + 0.1 * steps)``; 200-step episode cap).

No gym dependency — the env is three methods. The execution backend is
the injected ``runner(sql) -> runtime_s``, same as ``guided.py``.
"""

from __future__ import annotations

import random
from collections.abc import Callable
from dataclasses import dataclass, field

from deep_query_optimization_spark.catalog import Database
from deep_query_optimization_spark.generator import RandomQueryGen
from deep_query_optimization_spark.generator.partitioner import Log2Partitioner
from deep_query_optimization_spark.relational.builder import QueryBuilder

ACTIONS = QueryBuilder.MUTATIONS
HIT_REWARD = 1000.0
STEP_PENALTY = 0.1
EPISODE_CAP = 200  # reference db_env_v2.py:156


@dataclass
class QueryEnv:
    """State = coarse query shape; actions = builder mutations;
    reward shaped by log2-bucket distance to the target
    (reference ``db_env_v2.py:113-118``)."""

    db: Database
    runner: Callable[[str], float]
    target_bucket: int
    partitioner: Log2Partitioner = field(default_factory=Log2Partitioner)
    seed: int | None = None

    def __post_init__(self) -> None:
        self.rng = random.Random(self.seed)
        self.steps = 0
        self.builder: QueryBuilder | None = None

    def _observe(self) -> tuple[int, int, int]:
        q = self.builder.query
        return (min(len(q.relations), 5), min(len(q.conditions), 8), min(len(q.joins), 5))

    def reset(self) -> tuple[int, int, int]:
        gen = RandomQueryGen(self.db, seed=self.rng.randint(0, 2**31))
        self.builder = QueryBuilder(self.db, query=gen.randomize(), rng=self.rng)
        self.steps = 0
        return self._observe()

    def step(self, action: str) -> tuple[tuple[int, int, int], float, bool, float]:
        """Returns (state, reward, done, runtime)."""
        self.steps += 1
        self.builder.mutate(action)
        runtime = self.runner(self.builder.query.to_sql())
        bucket = self.partitioner.bucket(runtime)
        if bucket == self.target_bucket:
            return self._observe(), HIT_REWARD, True, runtime
        reward = -(abs(bucket - self.target_bucket) + STEP_PENALTY * self.steps)
        done = self.steps >= EPISODE_CAP
        return self._observe(), reward, done, runtime


@dataclass
class SarsaAgent:
    """Tabular SARSA(0) with epsilon-greedy policy
    (reference ``rl/agent.py:21-138``)."""

    alpha: float = 0.1
    gamma: float = 0.95
    epsilon: float = 0.2
    seed: int | None = None

    def __post_init__(self) -> None:
        self.rng = random.Random(self.seed)
        self.q: dict[tuple, dict[str, float]] = {}

    def _values(self, state: tuple) -> dict[str, float]:
        return self.q.setdefault(state, {a: 0.0 for a in ACTIONS})

    def act(self, state: tuple) -> str:
        if self.rng.random() < self.epsilon:
            return self.rng.choice(ACTIONS)
        vals = self._values(state)
        best = max(vals.values())
        return self.rng.choice([a for a, v in vals.items() if v == best])

    def update(self, s: tuple, a: str, r: float, s2: tuple, a2: str | None) -> None:
        target = r + (self.gamma * self._values(s2)[a2] if a2 is not None else 0.0)
        vals = self._values(s)
        vals[a] += self.alpha * (target - vals[a])


@dataclass
class EpisodicQueryGen:
    """k SARSA agents, one per runtime bucket, harvesting every executed
    query into the dataset (reference ``rl/__init__.py:34-126``)."""

    db: Database
    runner: Callable[[str], float]
    partitioner: Log2Partitioner = field(default_factory=Log2Partitioner)
    seed: int | None = None

    def __post_init__(self) -> None:
        self.rng = random.Random(self.seed)
        self.agents = {b: SarsaAgent(seed=self.rng.randint(0, 2**31)) for b in self.partitioner.buckets}
        self.dataset: list[tuple[str, float]] = []

    def run_episode(self, target_bucket: int, max_steps: int = EPISODE_CAP) -> bool:
        env = QueryEnv(
            self.db, self.runner, target_bucket, self.partitioner, seed=self.rng.randint(0, 2**31)
        )
        agent = self.agents[target_bucket]
        state = env.reset()
        action = agent.act(state)
        for _ in range(max_steps):
            state2, reward, done, runtime = env.step(action)
            self.dataset.append((env.builder.query.to_sql(), runtime))
            action2 = None if done else agent.act(state2)
            agent.update(state, action, reward, state2, action2)
            if done:
                return reward == HIT_REWARD
            state, action = state2, action2
        return False

    def generate(self, episodes_per_bucket: int = 1) -> list[tuple[str, float]]:
        for bucket in self.partitioner.buckets:
            for _ in range(episodes_per_bucket):
                self.run_episode(bucket)
        return self.dataset
