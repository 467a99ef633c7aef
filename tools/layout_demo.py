"""100 TB layout story, demonstrated end-to-end at the synthesized
sf10 dataset (VERDICT r10 item 7): re-write the corpus with
``layout.write_clustered`` / ``zorder_by``, measure FILE-PRUNE RATIOS
(from the parquet footers — the same min/max stats Spark's scan skips
by), time the selective probes on both layouts, and run the heavy
dedup pipelines (d9 over documents, d14 over embeddings) against the
clustered layout to show they execute unchanged on it.

Pruning is computed deterministically: each file's [min, max] for the
key column comes from its footer (pyarrow metadata, no data read); a
predicate must touch exactly the files whose range intersects it —
which is precisely the skip rule Spark applies. Wall-clock of the
probe rides along as secondary evidence that the skipping happens in
the live scan too.

Usage::

    python tools/layout_demo.py          # needs .scale_data/sf10 (run
                                         # scale_decade_bench first)

Appends a section to SCALE_BENCH.md and writes raw numbers to
.scale_data/layout_demo.json. Run SOLO (host noise rules for the
timing columns; the prune counts are noise-free)."""

from __future__ import annotations

import glob
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from es_to_clickhouse_spark.layout import (  # noqa: E402
    write_clustered,
    zorder_by,
)
from es_to_clickhouse_spark.session import get_spark  # noqa: E402

SRC10 = os.path.join(ROOT, ".scale_data", "sf10")
ARR = os.path.join(ROOT, ".scale_data", "sf10_arrival")
DST = os.path.join(ROOT, ".scale_data", "sf10_clustered")
ZDST = os.path.join(ROOT, ".scale_data", "sf10_zorder")
N_FILES = 64


def footer_ranges(path: str, col: str) -> list[tuple]:
    """Per-file [min, max] of ``col`` from the parquet footers — zero
    data read, exactly the stats Spark's file skipping consults."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            col
        ]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing: pruning impossible
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((lo, hi))
    return out


def files_touched(ranges: list[tuple], lo, hi) -> int:
    """How many files a ``col BETWEEN lo AND hi`` predicate must read
    under footer-stats skipping."""
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def timed_count(spark, path: str, pred) -> tuple[int, float]:
    df = spark.read.parquet(path).where(pred)
    t0 = time.monotonic()
    n = df.count()
    return n, round(time.monotonic() - t0, 3)


def main() -> None:
    if not os.path.exists(os.path.join(SRC10, "documents.parquet")):
        raise SystemExit(
            "sf10 dataset missing — run tools/scale_decade_bench.py first"
        )
    spark = get_spark("layout_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SRC10, "documents.parquet"))
    embs = spark.read.parquet(os.path.join(SRC10, "embeddings.parquet"))
    n_docs = docs.count()

    # 0. arrival-order baseline at the SAME file count: a fair prune
    # comparison needs both layouts to have N_FILES files — the raw
    # synthesis output can coalesce to very few large files, where
    # "1 of 1 touched" is vacuous. Round-robin repartition destroys
    # key locality exactly like an append-order ingest does.
    docs.repartition(N_FILES).write.mode("overwrite").parquet(
        os.path.join(ARR, "documents.parquet")
    )

    # 1. range-clustered rewrite (the compaction + clustering a real
    # 100 TB table maintenance job would run)
    os.makedirs(DST, exist_ok=True)
    write_clustered(
        docs, os.path.join(DST, "documents.parquet"), ["doc_id"], N_FILES
    )
    write_clustered(
        embs, os.path.join(DST, "embeddings.parquet"), ["vec_id"], N_FILES
    )

    # 2. z-ordered rewrite for two-key pruning (doc_id x n_chars)
    write_clustered(
        zorder_by(docs, ["doc_id", "n_chars"], bits=8),
        os.path.join(ZDST, "documents.parquet"),
        ["_z"],
        N_FILES,
    )

    # 3. prune ratios from the footers, plus live-scan timings
    base_r = footer_ranges(os.path.join(ARR, "documents.parquet"), "doc_id")
    clus_r = footer_ranges(os.path.join(DST, "documents.parquet"), "doc_id")
    zr_doc = footer_ranges(os.path.join(ZDST, "documents.parquet"), "doc_id")
    zr_nch = footer_ranges(os.path.join(ZDST, "documents.parquet"), "n_chars")

    # ~0.1% doc_id slice (the "fetch one shard of one replica" probe)
    lo, hi = 1000, 1000 + max(1, n_docs // 1000)
    pred = (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    n_b, t_b = timed_count(spark, os.path.join(ARR, "documents.parquet"), pred)
    n_c, t_c = timed_count(spark, os.path.join(DST, "documents.parquet"), pred)
    assert n_b == n_c, f"layout changed the answer: {n_b} != {n_c}"

    # n_chars band probe on the z-ordered layout (the second key a
    # lexicographic doc_id clustering cannot prune)
    zpred = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 120)
    n_zb, t_zb = timed_count(
        spark, os.path.join(ARR, "documents.parquet"), zpred
    )
    n_zc, t_zc = timed_count(
        spark, os.path.join(ZDST, "documents.parquet"), zpred
    )
    assert n_zb == n_zc

    nch_lo, nch_hi = 100, 120
    base_nch = footer_ranges(
        os.path.join(ARR, "documents.parquet"), "n_chars"
    )
    result = {
        "n_docs": n_docs,
        "files": {
            "baseline": len(base_r),
            "clustered": len(clus_r),
            "zorder": len(zr_doc),
        },
        "probe_docid": {
            "pred": f"doc_id BETWEEN {lo} AND {hi}",
            "files_touched_baseline": files_touched(base_r, lo, hi),
            "files_touched_clustered": files_touched(clus_r, lo, hi),
            "sec_baseline": t_b,
            "sec_clustered": t_c,
            "rows": n_b,
        },
        "probe_nchars_zorder": {
            "pred": f"n_chars BETWEEN {nch_lo} AND {nch_hi}",
            "files_touched_baseline": files_touched(
                base_nch, nch_lo, nch_hi
            ),
            "files_touched_zorder": files_touched(zr_nch, nch_lo, nch_hi),
            "sec_baseline": t_zb,
            "sec_zorder": t_zc,
            "rows": n_zb,
        },
    }

    # 4. the heavy pipelines run UNCHANGED against the clustered layout
    from es_to_clickhouse_spark.corpus import all_queries

    qs = all_queries()
    for q in ("d9_dup_clusters", "d14_semantic_dedup"):
        t0 = time.monotonic()
        rows_plain = qs[q](spark, SRC10).count()
        t_plain = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        rows_clus = qs[q](spark, DST).count()
        t_clus = round(time.monotonic() - t0, 3)
        assert rows_plain == rows_clus, (
            f"{q}: layout changed the answer {rows_plain} != {rows_clus}"
        )
        result[q] = {
            "rows": rows_clus,
            "sec_plain_layout": t_plain,
            "sec_clustered_layout": t_clus,
        }

    os.makedirs(os.path.join(ROOT, ".scale_data"), exist_ok=True)
    with open(os.path.join(ROOT, ".scale_data", "layout_demo.json"), "w") as f:
        json.dump(result, f, indent=1)

    pd = result["probe_docid"]
    pz = result["probe_nchars_zorder"]
    lines = [
        "",
        "## Layout demo at sf10 — clustered writes + Z-order file pruning"
        " (r11, tools/layout_demo.py)",
        "",
        f"{n_docs:,} documents re-written with `write_clustered` /",
        f"`zorder_by` into {N_FILES} range-disjoint files. Prune counts are",
        "FOOTER-DERIVED (min/max stats per file — the exact skip rule the",
        "scan applies), so they are noise-free; timings ride along as live",
        "evidence. Both heavy dedup pipelines run unchanged against the",
        "clustered layout and return identical results.",
        "",
        "| probe | layout | files touched / total | sec | rows |",
        "|---|---|---|---|---|",
        f"| {pd['pred']} | arrival-order | "
        f"{pd['files_touched_baseline']}/{result['files']['baseline']} "
        f"| {pd['sec_baseline']} | {pd['rows']:,} |",
        f"| {pd['pred']} | doc_id-clustered | "
        f"{pd['files_touched_clustered']}/{result['files']['clustered']} "
        f"| {pd['sec_clustered']} | {pd['rows']:,} |",
        f"| {pz['pred']} | arrival-order | "
        f"{pz['files_touched_baseline']}/{result['files']['baseline']} "
        f"| {pz['sec_baseline']} | {pz['rows']:,} |",
        f"| {pz['pred']} | z-order(doc_id,n_chars) | "
        f"{pz['files_touched_zorder']}/{result['files']['zorder']} "
        f"| {pz['sec_zorder']} | {pz['rows']:,} |",
        "",
        "| pipeline | rows | plain layout s | clustered layout s |",
        "|---|---|---|---|",
    ]
    for q in ("d9_dup_clusters", "d14_semantic_dedup"):
        r = result[q]
        lines.append(
            f"| {q} | {r['rows']:,} | {r['sec_plain_layout']} "
            f"| {r['sec_clustered_layout']} |"
        )
    lines.append("")
    with open(os.path.join(ROOT, "SCALE_BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
