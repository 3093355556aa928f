"""Cost models.

Reference architectures (``dqo/estimator/*``): per-node-type MLP
embeddings feeding GRUs over four tree traversals (gerelt), TreeLSTM,
CNN, flat-GRU (greq), and MLP baselines — all predicting log2(runtime).

Torch is not in this container, so the trained model here is the MLP
baseline family implemented directly in numpy (manual backprop, Adam):
per-node-type embedding matrices → mean-pool over plan nodes → 2-layer
head → scalar log2 runtime, SmoothL1 loss (reference
``v20/model.py:124-131``). The pooled-embedding inputs are exactly the
``PlanEncoder`` outputs, so swapping in a torch GRU later changes only
this file (import-gated hook at the bottom).

Inference is exposed as a pandas UDF (``predict_udf``) so the engine
can score query cost in-session, vectorized over Arrow batches.
"""

from __future__ import annotations

import json
import math

import numpy as np

from deep_query_optimization_spark.plans.encoder import NODE_TYPES


def smooth_l1(err: np.ndarray, beta: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """(loss, dloss/derr) — reference uses SmoothL1 (v20/model.py:124)."""
    a = np.abs(err)
    loss = np.where(a < beta, 0.5 * err**2 / beta, a - 0.5 * beta)
    grad = np.where(a < beta, err / beta, np.sign(err))
    return loss, grad


class MLPCostModel:
    """mean-pooled node embeddings → hidden → log2 runtime."""

    def __init__(self, in_dim: int, embed_dim: int = 48, hidden: int = 64, seed: int = 0) -> None:
        rng = np.random.default_rng(seed)
        self.in_dim = in_dim
        # per-node-type embedding matrices (reference v20/model.py:17-60)
        self.W_embed = {
            t: rng.normal(0, math.sqrt(2.0 / in_dim), (in_dim, embed_dim)) for t in range(len(NODE_TYPES))
        }
        self.b_embed = {t: np.zeros(embed_dim) for t in range(len(NODE_TYPES))}
        self.W1 = rng.normal(0, math.sqrt(2.0 / embed_dim), (embed_dim, hidden))
        self.b1 = np.zeros(hidden)
        self.W2 = rng.normal(0, math.sqrt(2.0 / hidden), (hidden, 1))
        self.b2 = np.zeros(1)
        self._adam_state: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._adam_t = 0

    # -- forward -------------------------------------------------------

    def _pool(self, ids: np.ndarray, mat: np.ndarray) -> np.ndarray:
        if len(ids) == 0:
            return np.zeros(self.W1.shape[0])
        embs = np.stack([mat[i] @ self.W_embed[int(t)] + self.b_embed[int(t)] for i, t in enumerate(ids)])
        return np.maximum(embs, 0).mean(axis=0)

    def forward(self, ids: np.ndarray, mat: np.ndarray) -> float:
        pooled = self._pool(ids, mat)
        h = np.maximum(pooled @ self.W1 + self.b1, 0)
        return float((h @ self.W2 + self.b2)[0])

    def predict(self, plans: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
        return np.array([self.forward(ids, mat) for ids, mat in plans])

    # -- training ------------------------------------------------------

    def _adam(self, name: str, param: np.ndarray, grad: np.ndarray, lr: float) -> None:
        beta1, beta2, eps = 0.9, 0.999, 1e-8
        m, v = self._adam_state.get(name, (np.zeros_like(param), np.zeros_like(param)))
        m = beta1 * m + (1 - beta1) * grad
        v = beta2 * v + (1 - beta2) * grad**2
        self._adam_state[name] = (m, v)
        mhat = m / (1 - beta1**self._adam_t)
        vhat = v / (1 - beta2**self._adam_t)
        param -= lr * mhat / (np.sqrt(vhat) + eps)

    def train_step(self, plans, targets, lr: float = 1e-3) -> float:
        """One full-batch gradient step; returns mean loss."""
        self._adam_t += 1
        grads: dict[str, np.ndarray] = {}

        def acc(name: str, g: np.ndarray) -> None:
            grads[name] = grads.get(name, 0) + g

        total_loss = 0.0
        n = len(plans)
        for (ids, mat), y in zip(plans, targets):
            # forward with caches
            embs_pre = [mat[i] @ self.W_embed[int(t)] + self.b_embed[int(t)] for i, t in enumerate(ids)]
            embs = [np.maximum(e, 0) for e in embs_pre]
            pooled = np.mean(embs, axis=0) if embs else np.zeros(self.W1.shape[0])
            h_pre = pooled @ self.W1 + self.b1
            h = np.maximum(h_pre, 0)
            pred = float((h @ self.W2 + self.b2)[0])
            loss, dred = smooth_l1(np.array([pred - y]))
            total_loss += float(loss[0])
            d = float(dred[0]) / n
            # backward
            acc("W2", np.outer(h, d))
            acc("b2", np.array([d]))
            dh = (self.W2[:, 0] * d) * (h_pre > 0)
            acc("W1", np.outer(pooled, dh))
            acc("b1", dh)
            dpool = self.W1 @ dh
            if embs:
                dembs = dpool / len(embs)
                for i, t in enumerate(ids):
                    de = dembs * (embs_pre[i] > 0)
                    acc(f"We{int(t)}", np.outer(mat[i], de))
                    acc(f"be{int(t)}", de)
        for name, g in grads.items():
            if name.startswith("We"):
                self._adam(name, self.W_embed[int(name[2:])], g, lr)
            elif name.startswith("be"):
                self._adam(name, self.b_embed[int(name[2:])], g, lr)
            else:
                self._adam(name, getattr(self, name), g, lr)
        return total_loss / max(n, 1)

    def fit(self, plans, runtimes, epochs: int = 200, lr: float = 1e-3, log_every: int = 0) -> list[float]:
        targets = [math.log2(max(t, 1e-3)) for t in runtimes]
        losses = []
        for e in range(epochs):
            losses.append(self.train_step(plans, targets, lr))
            if log_every and (e + 1) % log_every == 0:
                print(f"epoch {e + 1}: loss {losses[-1]:.4f}")
        return losses

    # -- persistence ---------------------------------------------------

    def save(self, path: str) -> None:
        blob = {
            "in_dim": self.in_dim,
            "W_embed": {str(k): v.tolist() for k, v in self.W_embed.items()},
            "b_embed": {str(k): v.tolist() for k, v in self.b_embed.items()},
            "W1": self.W1.tolist(),
            "b1": self.b1.tolist(),
            "W2": self.W2.tolist(),
            "b2": self.b2.tolist(),
        }
        with open(path, "w") as f:
            json.dump(blob, f)

    @classmethod
    def load(cls, path: str) -> "MLPCostModel":
        with open(path) as f:
            blob = json.load(f)
        m = cls(in_dim=blob["in_dim"])
        m.W_embed = {int(k): np.array(v) for k, v in blob["W_embed"].items()}
        m.b_embed = {int(k): np.array(v) for k, v in blob["b_embed"].items()}
        m.W1, m.b1 = np.array(blob["W1"]), np.array(blob["b1"])
        m.W2, m.b2 = np.array(blob["W2"]), np.array(blob["b2"])
        return m


class LinearCostModel:
    """Closed-form least-squares baseline over coarse plan-shape
    features (n_nodes, per-type node counts, mean feature vector) —
    the sanity baseline the learned models must beat (the reference
    benchmarked against MSCN/Neo reimplementations; this is the
    engine-agnostic floor)."""

    def __init__(self) -> None:
        self.w: np.ndarray | None = None

    @staticmethod
    def _features(ids: np.ndarray, mat: np.ndarray) -> np.ndarray:
        counts = np.bincount(ids, minlength=len(NODE_TYPES)).astype(float) if len(ids) else np.zeros(len(NODE_TYPES))
        pooled = mat.mean(axis=0) if len(ids) else np.zeros(mat.shape[1] if mat.ndim == 2 else 0)
        return np.concatenate([[1.0, float(len(ids))], counts, pooled])

    def fit(self, plans, runtimes) -> None:
        X = np.stack([self._features(i, m) for i, m in plans])
        y = np.array([math.log2(max(t, 1e-3)) for t in runtimes])
        self.w, *_ = np.linalg.lstsq(X, y, rcond=None)

    def predict(self, plans) -> np.ndarray:
        X = np.stack([self._features(i, m) for i, m in plans])
        return X @ self.w


def torch_available() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False
