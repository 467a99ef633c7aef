"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full distributed
compute, no driver-side materialization cost), after a warm-up of the JVM
with a trivial job. Timings are per-query wall clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from es_to_clickhouse_spark.corpus import all_queries
from es_to_clickhouse_spark.session import get_spark

#: headline set: one per operator family, weighted toward scan/join/agg
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "j5_star_join",
    "j7_asof_join",
    "j1_inner_join_agg",
    "a4_sum_accumulators",
    "a5_distinct_count",
    "w1_latest_per_key",
    "w2_rank_topn_per_group",
    "t7_tumbling_window",
    "t8_session_window",
    "s1_full_scan",
    "s2_incremental_scan",
    "p1_flatten_json",
    "d2_fingerprint_dedup",
    "d4_lsh_band_buckets",
    "sim1_cosine_topk",
    "txt2_quality_score",
    "st1_union_all",
    "o4_topk_recent",
    "j9_asof_global",
    "rj1_range_join",
    "sk1_kmv_distinct",
    "sk2_hash_sample",
    "q5_local_supplier_volume",
    "q18_large_volume_customers",
    "ts1_hourly_gap_fill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # JVM/codegen warm-up on a tiny unrelated job
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Four passes per query: the first (cold) pays one-time plan compile +
    # whole-stage codegen + file listing; the best of three warm passes is
    # the steady-state throughput that scales with data volume — at
    # production scale compile time amortizes to zero, so warm is the
    # headline, and min-of-3 strips same-machine scheduling noise
    # (single-pass warm totals vary ±15-30% run to run on this shared
    # host; the min is the stable estimator of the actual compute cost).
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.time() - t0, 3)
        warms = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(time.time() - t0)
        timings[name] = round(min(warms), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()), 3),
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
