"""Benchmark harness — runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is executed to completion via the noop sink (full distributed
execution, no driver-side row transfer skewing the number). A warmup
query first touches every parquet file so JVM/class-loading cost isn't
billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from sea_express_customs_etl_spark.session import get_spark

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 32,
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warmup: touch all tables once (scan + count), then run the flagship
    # end-to-end once so JIT/codegen/shuffle machinery is warm — the
    # measured numbers are steady-state throughput, which is what a
    # long-lived cluster sees.
    from sea_express_customs_etl_spark.plans.standins import load_table

    for t in ("lineitem", "orders", "part", "documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).count()
    if "knowledge_extraction" in qs:
        qs["knowledge_extraction"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # best-of-2 per query: the local machine is noisy (±50% on short
    # queries); the minimum is the honest steady-state capability
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
