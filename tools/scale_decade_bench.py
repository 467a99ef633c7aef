"""Two-decade scale evidence for the top-3 iterative cost centers
(r9 VERDICT item 7): d9/d10 (LSH → verify → connected-components over
documents) and d14 (SemDeDup over embeddings) measured at sf0.1, 10x
and 100x — the open question at 10x was whether their per-round
scheduler CONSTANT amortizes; a second decade answers it with data.

Synthesis reuses tools/scale_bench.py's machinery (per-replica key
stride, bijective token rename, seeded signed-permutation orthogonal
embedding transform) at factor=100 for ONLY the two tables these
queries read. The orthogonal transform replaced r10's rotate+flip
(VERDICT r10 item 4): rotations retained shift-structure cosine across
replicas, so d6's 100x output grew 104x from synthesis artifacts; the
per-replica signed permutation drives cross-replica cosine to
~N(0, 1/dim) while keeping every within-replica planted near-dup
intact (both members transform identically).

Usage::

    python tools/scale_decade_bench.py              # synthesize + run
    python tools/scale_decade_bench.py --run-only   # reuse datasets

Appends a "100x decade" section to SCALE_BENCH.md and writes raw
numbers to .scale_data/scale_decade.json. Run SOLO (host noise rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

from es_to_clickhouse_spark.session import get_spark  # noqa: E402
from scale_bench import (  # noqa: E402
    KEY_COLS,
    SRC,
    _ortho_embeddings,
    _replicate,
    _salt_documents,
    time_queries,
)

DST10 = os.path.join(ROOT, ".scale_data", "sf1")
DST100 = os.path.join(ROOT, ".scale_data", "sf10")
FACTOR = 100
#: the r9-named top-3 plus (r10, --wide) the rest of the heavy
#: dedup/similarity family that reads only these two tables — the
#: queries whose quadratic stages ride LSH-band / block bounds that a
#: second decade either validates or exposes (d14's 59.7x was exactly
#: such an exposure)
QUERIES = ["d9_dup_clusters", "d10_retention_policy", "d14_semantic_dedup"]
WIDE_QUERIES = [
    "d5_ngram_jaccard_pairs",
    "d12_minhash_estimate_error",
    "d6_embedding_neardup",
    "txt10_contamination_check",
    "sim6_knn_graph",
    "d18_embedding_neardup_cell",
    "d19_incremental_neardup",
]
TABLES = ["documents", "embeddings"]


def synthesize_100x(spark) -> None:
    os.makedirs(DST100, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        rep = _replicate(df, KEY_COLS[t], FACTOR)
        if t == "documents":
            rep = _salt_documents(rep)
        else:
            rep = _ortho_embeddings(rep, FACTOR)
        out = rep.select(df.columns)
        out.write.mode("overwrite").parquet(os.path.join(DST100, f"{t}.parquet"))
        n0 = df.count()
        n1 = spark.read.parquet(os.path.join(DST100, f"{t}.parquet")).count()
        assert n1 == n0 * FACTOR, f"{t}: {n1} != {n0}*{FACTOR}"
        print(f"synth100 {t}: {n0:,} -> {n1:,}", flush=True)


def main() -> None:
    spark = get_spark("scale_decade")
    spark.sparkContext.setLogLevel("ERROR")
    if "--run-only" not in sys.argv[1:]:
        synthesize_100x(spark)
    if not os.path.exists(os.path.join(DST10, "documents.parquet")):
        raise SystemExit(
            "10x dataset missing — run `python tools/scale_bench.py "
            "--synth-only` first"
        )
    names = QUERIES + (WIDE_QUERIES if "--wide" in sys.argv[1:] else [])
    results = {}
    for label, d in (("sf0.1", SRC), ("10x", DST10), ("100x", DST100)):
        print(f"=== {label} ===", flush=True)
        results[label] = time_queries(spark, d, names)

    lines = [
        "",
        "## 100x decade — " + " / ".join(n.split("_")[0] for n in names)
        + " (r11: ortho synthesis + sim6 fixed probes + d14 two-level"
        " assign; tools/scale_decade_bench.py)",
        "",
        "Two decades for the iterative cost centers whose 10x ratios were",
        "dominated by per-round scheduler constants: if the constant",
        "amortizes, the second decade's ratio should approach the data",
        "ratio from BELOW over ratios like 1.3x at the first decade.",
        "",
        "| query | sf0.1 s | 10x s | 100x s | 10x ratio | 100x/10x ratio "
        "| rows 100x |",
        "|---|---|---|---|---|---|---|",
    ]
    for q in names:
        b = results["sf0.1"][q]
        m = results["10x"][q]
        s = results["100x"][q]
        lines.append(
            f"| {q} | {b['sec']} | {m['sec']} | {s['sec']} "
            f"| {m['sec'] / b['sec']:.1f}x | {s['sec'] / m['sec']:.1f}x "
            f"| {s['rows']:,} |"
        )
    lines.append("")
    with open(os.path.join(ROOT, "SCALE_BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    with open(os.path.join(ROOT, ".scale_data", "scale_decade.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
