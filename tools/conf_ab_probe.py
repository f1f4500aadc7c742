"""A/B probe for session-level configuration candidates (guide §9):
times a fixed set of mid-weight queries best-of-2 under the current
session defaults vs a candidate conf, in TWO separate sessions of the
same process run back-to-back (closest this box gets to a controlled
comparison; the ±40% cross-invocation band still applies, so only
adopt wins that are large and mechanistically explicable).

Usage: python tools/conf_ab_probe.py KEY=VALUE [KEY=VALUE ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "knowledge_extraction",
    "basket_rules",
    "frequent_part_triples",
    "hashed_doc_topk",
    "bootstrap_value_ci",
    "event_markov_transitions",
    "salted_join_revenue",
    "customer_decile_migration",
    "lineitem_constraints",
    "fk_orphan_audit",
]


def run_side(conf: dict[str, str], label: str, sf_dir: str) -> dict:
    from sea_express_customs_etl_spark.plans.cache import release_tracked
    from sea_express_customs_etl_spark.plans.standins import load_table
    from sea_express_customs_etl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name=f"conf_ab_{label}", extra_conf=conf)
    qs = entrymod.queries()
    for t in ("lineitem", "orders", "part", "documents", "events"):
        load_table(spark, sf_dir, t).count()
    out = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        release_tracked()
        out[name] = round(best, 3)
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cand = dict(kv.split("=", 1) for kv in sys.argv[1:])
    base = run_side({}, "base", sf_dir)
    # NOTE: same-process second session inherits a stopped context's
    # JVM; conf must be set at session build, which extra_conf does.
    test = run_side(cand, "cand", sf_dir)
    rows = {
        k: {"base": base[k], "cand": test[k]} for k in QUERIES
    }
    print(json.dumps({"conf": cand, "results": rows,
                      "base_total": round(sum(base.values()), 3),
                      "cand_total": round(sum(test.values()), 3)}))


if __name__ == "__main__":
    main()
