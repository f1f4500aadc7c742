"""Per-query bench probe — best-of-2 noop-sink timing for NAMED
queries in ONE session (the CLAUDE.md rule: never compare operators
across bench invocations hours apart). Same methodology as bench.py
(warmup table touch, release_tracked between queries), restricted to a
query list so before/after comparisons for an optimization are cheap.

Usage: python tools/query_probe.py QUERY [QUERY ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_CPUS.
Prints one JSON line: {"probe": {name: best_sec, ...}, "sf_dir": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    names = sys.argv[1:]

    from sea_express_customs_etl_spark.session import get_spark

    spark = get_spark(
        app_name="query_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2 if cpus.isdigit() else 32,
    )

    import __spark_entry__ as entrymod
    from sea_express_customs_etl_spark.plans.cache import release_tracked
    from sea_express_customs_etl_spark.plans.standins import load_table

    qs = entrymod.queries()
    for t in ("lineitem", "orders", "part", "documents", "embeddings", "events"):
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query: {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"probe: {name}")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        release_tracked()
        timings[name] = round(best, 3)
        print(f"{name:28s} {best:7.3f}s", file=sys.stderr)
    print(json.dumps({"probe": timings, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
