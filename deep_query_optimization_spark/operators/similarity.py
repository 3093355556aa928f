"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB design requires:

- ``cosine_topk``: brute-force exact top-k. The probe set broadcasts
  (it is small by definition); the corpus streams through one scan —
  no shuffle of the corpus at all, the only shuffle is the final
  per-probe top-k aggregation on k·|probes| rows. This is the oracle
  and the right choice whenever |probes|·|corpus| work fits the
  cluster.
- ``hyperplane_lsh_topk``: approximate scale path. Sign-of-projection
  signatures against ``n_planes`` fixed random hyperplanes bucket the
  corpus; probes only score their own bucket (plus optional multi-probe
  neighbors). Corpus signature is one scan; the join is bucket-local.
  Recall is tested against the brute-force tier in pytest.

Vector math is JVM-side (``zip_with``/``aggregate`` over doubles); a
Pandas-UDF path is deliberately NOT used here — for 64-d vectors the
expression path avoids Arrow transfer entirely and keeps whole-stage
codegen.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deep_query_optimization_spark.functions import (
    cosine_from_norms,
    cosine_similarity,
    parallelize_input,
    vector_norm,
)


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each probe (excluding self), ranked by
    cosine desc with id tie-break — fully deterministic."""
    c = parallelize_input(corpus).select(
        F.col(id_col).alias("nn_id"), F.col(vec_col).alias("vc"), vector_norm(F.col(vec_col)).alias("nc")
    )
    p = F.broadcast(
        probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("vp"), vector_norm(F.col(vec_col)).alias("np"))
    )
    cos = cosine_from_norms(F.col("vp"), F.col("vc"), F.col("np"), F.col("nc"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_raw").desc(), F.col("nn_id"))
    return (
        c.join(p, F.col("probe_id") != F.col("nn_id"))
        .select("probe_id", "nn_id", cos.alias("cos_raw"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "nn_id", F.round(F.col("cos_raw"), 4).alias("cos"), "rnk")
    )


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 13) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; sign only)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature of a vector column against fixed planes —
    a single integer bucket id, computed JVM-side."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: probes score only corpus vectors in the same
    hyperplane bucket. ~2^-n_planes of the corpus per probe."""
    planes = hyperplanes(dim, n_planes, seed)
    c = parallelize_input(corpus).select(
        F.col(id_col).alias("nn_id"),
        F.col(vec_col).alias("vc"),
        vector_norm(F.col(vec_col)).alias("nc"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("vp"),
            vector_norm(F.col(vec_col)).alias("np"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
    )
    cos = cosine_from_norms(F.col("vp"), F.col("vc"), F.col("np"), F.col("nc"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_raw").desc(), F.col("nn_id"))
    return (
        c.join(p, ["bucket"])
        .filter(F.col("probe_id") != F.col("nn_id"))
        .select("probe_id", "nn_id", cos.alias("cos_raw"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "nn_id", F.round(F.col("cos_raw"), 4).alias("cos"), "rnk")
    )
