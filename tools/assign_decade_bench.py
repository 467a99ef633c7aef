"""Assign-stage decade bench (VERDICT r10 item 3's done criterion):
time ONLY the IVF assignment across THREE decades — sf0.1 (2k), 10x
(20k), 100x (200k) and a 1000x embeddings-only synthesis (2M vectors)
— for both the dense nearest-of-k assign (``ivf_assign``, the N x k
matrix: ~N²/256 under the corpus-scaled cell rule) and the two-level
quantizer (``ivf_assign_two_level``, O(N·sqrt(k))). The dense assign
is skipped at 1000x by design (2M x 7812 dots is the plan the
two-level path exists to avoid; its expected cost is extrapolated in
the report instead).

Usage::

    python tools/assign_decade_bench.py            # synthesize + run
    python tools/assign_decade_bench.py --run-only

Appends a section to SCALE_BENCH.md, raw numbers to
.scale_data/assign_decade.json. Run SOLO."""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from es_to_clickhouse_spark.operators.similarity import (  # noqa: E402
    ivf_assign,
    ivf_assign_hierarchical,
    ivf_assign_two_level,
    sampled_centroids,
)
from es_to_clickhouse_spark.session import get_spark  # noqa: E402
from scale_bench import (  # noqa: E402
    KEY_COLS,
    SRC,
    _ortho_embeddings,
    _replicate,
)

# r12: shares the third-decade synthesis (scale_decade_bench --third)
DST1000 = os.path.join(ROOT, ".scale_data", "sf100")
SCALES = [
    ("sf0.1", os.path.join(SRC, "embeddings.parquet")),
    ("10x", os.path.join(ROOT, ".scale_data", "sf1", "embeddings.parquet")),
    ("100x", os.path.join(ROOT, ".scale_data", "sf10", "embeddings.parquet")),
    ("1000x", os.path.join(DST1000, "embeddings.parquet")),
]
WARM = 2


def synthesize_1000x(spark) -> None:
    if os.path.exists(os.path.join(DST1000, "embeddings.parquet")):
        print("synth1000 embeddings: exists, skipping", flush=True)
        return
    df = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    rep = _ortho_embeddings(
        _replicate(df, KEY_COLS["embeddings"], 1000), 1000
    )
    out = rep.select(df.columns)
    out.write.mode("overwrite").parquet(
        os.path.join(DST1000, "embeddings.parquet")
    )
    n = spark.read.parquet(os.path.join(DST1000, "embeddings.parquet")).count()
    assert n == df.count() * 1000
    print(f"synth1000 embeddings: {n:,}", flush=True)


def time_assign(spark, path: str, fn) -> dict:
    emb = spark.read.parquet(path)
    n = emb.count()
    # hash-sampled, NOT `vec_id < k`: the value-threshold rule saturates
    # on the strided replicated ids — the r11 1000x row here silently
    # measured 2,000 centroids where it claimed 7,812 (the same bug the
    # d14 third decade exposed; operators/similarity.sampled_centroids)
    cents = sampled_centroids(emb)
    k = cents.count()
    warms = []
    rows = None
    for _ in range(WARM + 1):
        t0 = time.monotonic()
        rows = fn(emb, cents).count()
        warms.append(time.monotonic() - t0)
    return {
        "n": n,
        "k": k,
        "sec": round(min(warms[1:]), 3),
        "cold": round(warms[0], 3),
        "rows": rows,
    }


def main() -> None:
    spark = get_spark("assign_decade")
    spark.sparkContext.setLogLevel("ERROR")
    if "--run-only" not in sys.argv[1:]:
        synthesize_1000x(spark)
    argv = sys.argv[1:]
    only = (
        set(argv[argv.index("--scales") + 1].split(","))
        if "--scales" in argv
        else None
    )
    results: dict[str, dict] = {}
    for label, path in SCALES:
        if only is not None and label not in only:
            continue
        if not os.path.exists(path):
            raise SystemExit(f"{label} missing at {path}")
        entry: dict = {}
        entry["two_level"] = time_assign(spark, path, ivf_assign_two_level)
        entry["hierarchical"] = time_assign(
            spark, path, ivf_assign_hierarchical
        )
        if label != "1000x":  # the dense N x k matrix is the avoided plan
            entry["dense"] = time_assign(spark, path, ivf_assign)
        results[label] = entry
        print(f"  {label}: {entry}", flush=True)

    lines = [
        "",
        "## Assign-stage decades — dense vs two-level vs log-depth"
        " hierarchical (r12 re-run: hash-sampled centroids fix the"
        " dense-id saturation the r11 1000x row carried;"
        " tools/assign_decade_bench.py)",
        "",
        "The isolated IVF assignment (k = max(8, n/256) corpus-scaled"
        " cells,",
        "2k -> 2M vectors). The dense assign is ~N^2/256 under the scaled"
        " cell",
        "rule; the two-level quantizer routes through isqrt(k)"
        " super-centroids.",
        "Dense is deliberately not run at 1000x (2M x 7,812 dot products"
        " is the",
        "plan the escalation exists to avoid).",
        "",
        "| scale | n | k | dense s | two-level s | two-level decade"
        " ratio | hierarchical s (fanout 64) |",
        "|---|---|---|---|---|---|---|",
    ]
    prev = None
    for label, _ in SCALES:
        if label not in results:
            continue
        e = results[label]
        tl = e["two_level"]
        ratio = f"{tl['sec'] / prev:.1f}x" if prev else "—"
        dense = e.get("dense", {}).get("sec", "(skipped)")
        hier = e.get("hierarchical", {}).get("sec", "—")
        lines.append(
            f"| {label} | {tl['n']:,} | {tl['k']:,} | {dense} "
            f"| {tl['sec']} | {ratio} | {hier} |"
        )
        prev = tl["sec"]
    lines.append("")
    with open(os.path.join(ROOT, "SCALE_BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    with open(
        os.path.join(ROOT, ".scale_data", "assign_decade.json"), "w"
    ) as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
