"""Skew story end-to-end: measure a hot-key join under the three
mitigation regimes and commit the numbers.

Corpus: a fact table where ``hot_frac`` of all rows carry ONE key (the
celebrity-user / null-key shape that kills 100 TB joins) and the rest
spread uniformly; a dimension table keyed 0..n_keys. The dimension is
too big to broadcast at the forced threshold, so the join must
shuffle — exactly the regime salting exists for.

Regimes:
- ``plain``      AQE off: the hot key's rows land in ONE reducer; the
                 stage is as slow as that task.
- ``aqe``        AQE + skew-join handling on (session defaults):
                 oversized partitions split at runtime.
- ``salted``     functions.salted_join, AQE off: the shuffle key
                 becomes (key, salt) so the hot key spreads over
                 n_salts reducers regardless of runtime support.

Writes reports/skew_report.json. Deterministic corpus (xxhash64
uniforms, same trick as lab/data_generator).

Usage: python tools/skew_report.py [n_fact] [n_keys] [hot_frac]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from deep_query_optimization_spark.functions import salted_join, salted_join_hot  # noqa: E402
from deep_query_optimization_spark.session import get_spark  # noqa: E402


def build_corpus(spark, n_fact: int, n_keys: int, hot_frac: float):
    """Deterministic skewed fact + uniform dimension. The fact's key is
    the hot key for ``hot_frac`` of rows (by xxhash64 uniform), else
    uniform over [0, n_keys)."""
    u = (F.xxhash64(F.col("id")).cast("double") / F.lit(2.0**63)).alias("u")  # [-1, 1)
    fact = (
        spark.range(n_fact)
        .select(
            "id",
            ((F.xxhash64(F.col("id") + 7).cast("double") / F.lit(2.0**63) + 1.0) / 2.0).alias("u2"),
            ((u + 1.0) / 2.0).alias("u1"),
        )
        .select(
            "id",
            F.when(F.col("u1") < hot_frac, F.lit(0))
            .otherwise((F.col("u2") * n_keys).cast("long"))
            .alias("k"),
            (F.col("u2") * 100).alias("v"),
        )
    )
    dim = spark.range(n_keys).select(
        F.col("id").alias("k"), F.concat(F.lit("grp_"), (F.col("id") % 50).cast("string")).alias("grp")
    )
    return fact, dim


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    spark = get_spark("skew-report")
    spark.sparkContext.setLogLevel("ERROR")
    # force a shuffle join: the dimension must not broadcast, or the
    # skew never reaches a reducer
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    fact, dim = build_corpus(spark, n_fact, n_keys, hot_frac)
    fact.write.mode("overwrite").parquet("/tmp/dqo_skew/fact")
    dim.write.mode("overwrite").parquet("/tmp/dqo_skew/dim")
    fact = spark.read.parquet("/tmp/dqo_skew/fact")
    dim = spark.read.parquet("/tmp/dqo_skew/dim")

    def plain():
        return (
            fact.join(dim, "k").groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )

    def salted():
        return (
            salted_join(fact, dim, "k", n_salts=32)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )

    def salted_hot():
        return (
            salted_join_hot(fact, dim, "k", n_salts=32)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )

    results: dict[str, float] = {}
    runs = [
        ("plain", plain, False),
        ("aqe", plain, True),
        ("salted", salted, False),
        ("salted_hot", salted_hot, False),
    ]
    for name, mk, aqe in runs:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        timed(mk())  # warm (parquet footers, codegen)
        results[name] = round(min(timed(mk()) for _ in range(2)), 3)
        print(f"{name:7s} {results[name]:7.2f}s (aqe={aqe})", flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # sanity: identical results across regimes (counts exact; double
    # sums rounded — accumulation order differs between plans)
    a = {(r["grp"], r["n"], round(r["s"], 2)) for r in plain().collect()}
    for mk in (salted, salted_hot):
        b = {(r["grp"], r["n"], round(r["s"], 2)) for r in mk().collect()}
        assert a == b, f"{mk.__name__} changed the result"

    out = {
        "n_fact": n_fact,
        "n_keys": n_keys,
        "hot_frac": hot_frac,
        "seconds": results,
        "speedup_salted_vs_plain": round(results["plain"] / results["salted"], 2),
        "speedup_salted_hot_vs_plain": round(results["plain"] / results["salted_hot"], 2),
        "note": (
            "hot key = {:.0%} of fact rows in ONE join key; dimension too large "
            "to broadcast (threshold forced to -1). 'plain' puts the hot key in "
            "one reducer; 'aqe' lets runtime skew-split handle it; 'salted' "
            "splits the shuffle key as (key, salt) x{} up front replicating the "
            "whole dimension; 'salted_hot' samples for heavy hitters and salts "
            "only those keys (partial salting).".format(hot_frac, 32)
        ),
    }
    path = Path(__file__).resolve().parent.parent / "reports" / "skew_report.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
