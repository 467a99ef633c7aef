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


DST1000 = os.path.join(ROOT, ".scale_data", "sf100")
#: the two queries whose second-decade ratios (d14 6.4x, txt10 7.4x)
#: had not yet been shown to amortize at 1000x the way d5/d9/d19's did
#: (r11 VERDICT #5). txt10 reads documents only (synthesized for the
#: r11 third decade); d14 reads embeddings only (synthesized here at
#: factor 1000 with the same per-replica orthogonal transform).
THIRD_QUERIES = ["txt10_contamination_check", "d14_semantic_dedup"]
FACTOR1000 = 1000


def synthesize_1000x(spark) -> None:
    os.makedirs(DST1000, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(DST1000, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"synth1000 {t}: exists, skipping", flush=True)
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        rep = _replicate(df, KEY_COLS[t], FACTOR1000)
        if t == "documents":
            rep = _salt_documents(rep)
        else:
            rep = _ortho_embeddings(rep, FACTOR1000)
        out = rep.select(df.columns)
        out.write.mode("overwrite").parquet(dst)
        n0 = df.count()
        n1 = spark.read.parquet(dst).count()
        assert n1 == n0 * FACTOR1000, f"{t}: {n1} != {n0}*{FACTOR1000}"
        print(f"synth1000 {t}: {n0:,} -> {n1:,}", flush=True)


def third_decade_main() -> None:
    """``--third``: measure THIRD_QUERIES at 100x and 1000x in ONE solo
    session (self-consistent decade ratio — no cross-host comparison)
    and append the verdict table to SCALE_BENCH.md."""
    spark = get_spark("scale_decade3")
    spark.sparkContext.setLogLevel("ERROR")
    if "--run-only" not in sys.argv[1:]:
        synthesize_1000x(spark)
    argv = sys.argv[1:]
    names = (
        argv[argv.index("--queries") + 1].split(",")
        if "--queries" in argv
        else THIRD_QUERIES
    )
    results = {}
    for label, d in (("100x", DST100), ("1000x", DST1000)):
        print(f"=== {label} ===", flush=True)
        results[label] = time_queries(spark, d, names)
    lines = [
        "",
        "## Third decade — 1000x for d14 (2M embeddings) and txt10 "
        "(5M docs) (r12, tools/scale_decade_bench.py --third)",
        "",
        "The two second-decade ratios (d14 6.4x, txt10 7.4x) that had",
        "not yet been shown to amortize at 1000x; 100x re-measured in",
        "the same solo session so the decade ratio is host-consistent.",
        "",
        "| query | 100x s | 1000x s | decade ratio | rows 100x | rows "
        "1000x | output ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for q in names:
        m = results["100x"][q]
        s = results["1000x"][q]
        lines.append(
            f"| {q} | {m['sec']} | {s['sec']} "
            f"| {s['sec'] / m['sec']:.1f}x | {m['rows']:,} | {s['rows']:,} "
            f"| {s['rows'] / max(m['rows'], 1):.1f}x |"
        )
    lines.append("")
    with open(os.path.join(ROOT, "SCALE_BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    with open(
        os.path.join(ROOT, ".scale_data", "scale_third_decade.json"), "w"
    ) as f:
        json.dump(results, f, indent=1)


def main() -> None:
    if "--third" in sys.argv[1:]:
        third_decade_main()
        return
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
