"""Learned cost-model harness.

Reference ``dqo/estimator`` (§2.8): labeled query datasets with
log2-bucketed runtimes, bucket-balanced splits, metrics
(accuracy/MAE/macro-F1), several neural architectures, and an
evaluation harness. PyTorch is not available in this container, so the
trainable model is a from-scratch numpy MLP over pooled plan-node
vectors (the reference's MLP baseline family); the GRU/TreeLSTM
variants are architecture drop-ins once torch exists (import-gated).
"""

from deep_query_optimization_spark.estimator.dataset import QueriesDataset  # noqa: F401
from deep_query_optimization_spark.estimator.metrics import (  # noqa: F401
    bucketize,
    mae,
    mcc_metrics,
)
from deep_query_optimization_spark.estimator.model import MLPCostModel  # noqa: F401
