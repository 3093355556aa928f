"""Self-similar scale-up of the driver testdata: produce an sfN dir
from sf0.1 by unioning key-SHIFTED copies of each fact table.

Unlike with-replacement resampling (``lab.data_generator.scale_table``,
the reference's ``data_scaler.py`` semantics), key shifting preserves
the relational invariants the workload's oracles rely on: primary keys
stay unique, every foreign key still resolves (copy i of lineitem
references copy i of orders/part/supplier), and join selectivities per
key are unchanged — so the same queries are valid at every factor and
runtimes scale with data, not with artificial key hotness. Dimension
tables (region, nation) keep their natural size, exactly like TPC-H.

Usage: python tools/make_scaled_sf.py [factor] [out_dir]
       (default: 10 /root/repo/.data/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from deep_query_optimization_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-table key columns to shift per copy (PKs and the FKs that point
# at other shifted tables); nation/region keys are NOT shifted — the
# dimensions stay fixed-size and every copy references them
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# offset strides: key spaces are disjoint per copy when the stride
# exceeds the max key; align strides between FK pairs
STRIDE_OF = {
    "c_custkey": "customer",
    "o_custkey": "customer",
    "o_orderkey": "orders",
    "l_orderkey": "orders",
    "p_partkey": "part",
    "l_partkey": "part",
    "s_suppkey": "supplier",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": "events_user",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")

    from deep_query_optimization_spark.catalog import read_table

    # one stride per key family, derived from the base data
    strides: dict[str, int] = {}
    for tbl, pk in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        strides[tbl] = int(read_table(spark, SRC, tbl).agg(F.max(pk)).collect()[0][0]) + 1
    strides["events_user"] = (
        int(read_table(spark, SRC, "events").agg(F.max("user_id")).collect()[0][0]) + 1
    )

    for name in "region nation customer supplier part orders lineitem events documents embeddings".split():
        df = read_table(spark, SRC, name)
        keys = SHIFT_KEYS.get(name)
        if keys:
            copies = []
            for i in range(factor):
                c = df
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * strides[STRIDE_OF[k]]))
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionAll(c)
        else:
            out = df
        out.write.mode("overwrite").parquet(str(out_dir / f"{name}.parquet"))
        print(f"{name}: {'x' + str(factor) if keys else 'dim (x1)'}", flush=True)
    print(f"done -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
