"""Round-13 streaming micro-batch probe.

Replicates the two streaming gate queries' availableNow drains but
captures ``query.recentProgress`` — per-batch ``durationMs`` breakdown
(addBatch, walCommit, commitOffsets, triggerExecution, ...) and
stateOperators metrics (commit times, state rows) — so the per-batch
state-store / WAL cost is measured, not inferred (guide §1: measure
first). Prints one JSON line per run config.

Usage:
  python tools/stream_probe_r13.py [--reps 3] [--conf k=v ...] \
      [--state-partitions 4] [--query hourly|sessionize|both]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deep_query_optimization_spark.session import get_spark  # noqa: E402


def drain(spark, sf_dir, which, state_partitions, sink):
    """One availableNow drain; returns (wall_sec, progress_list)."""
    import uuid

    from deep_query_optimization_spark.streaming import (
        events_file_stream,
        hourly_rollup,
        sessionize,
    )

    if which == "hourly":
        stream = hourly_rollup(events_file_stream(spark, f"{sf_dir}/events.parquet"), watermark="1 hour")
    else:
        stream = sessionize(events_file_stream(spark, f"{sf_dir}/events.parquet"), gap="30 minutes")

    ckpt = tempfile.mkdtemp(prefix="dqo_probe_ckpt_")
    out = tempfile.mkdtemp(prefix="dqo_probe_out_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    name = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    try:
        w = stream.writeStream.option("checkpointLocation", ckpt).trigger(availableNow=True)
        if sink == "memory":
            q = w.format("memory").queryName(name).outputMode("append").start()
        else:
            q = w.format("parquet").option("path", out).outputMode("append").start()
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    wall = round(time.time() - t0, 4)
    progress = [json.loads(p.json) if not isinstance(p, dict) else p for p in q.recentProgress]
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    return wall, progress


def summarize(progress):
    out = []
    for p in progress:
        d = p.get("durationMs", {})
        so = p.get("stateOperators", [])
        out.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": d,
                "state": [
                    {
                        k: s.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "numRowsTotal",
                            "numRowsUpdated",
                            "allUpdatesTimeMs",
                            "allRemovalsTimeMs",
                            "numShufflePartitions",
                        )
                    }
                    for s in so
                ],
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--state-partitions", type=int, default=4)
    ap.add_argument("--query", default="both", choices=["hourly", "sessionize", "both"])
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    ap.add_argument("--tag", default="probe")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("dqo-stream-probe-r13", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    queries = ["hourly", "sessionize"] if args.query == "both" else [args.query]
    results = {}
    for which in queries:
        sink = "memory" if which == "hourly" else "parquet"
        walls, batches = [], None
        for _ in range(args.reps):
            wall, progress = drain(spark, sf_dir, which, args.state_partitions, sink)
            walls.append(wall)
            batches = summarize(progress)
        results[which] = {"walls": walls, "min": min(walls), "last_batches": batches}
    print(json.dumps({"tag": args.tag, "state_partitions": args.state_partitions, "conf": extra, "results": results}, indent=1))


if __name__ == "__main__":
    main()
