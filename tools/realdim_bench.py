"""Real-embedding-shaped fixture for the near-dup family (judge r12 #6).

The d6/d18 1000x verdicts hinge on an ARGUED adjudication: "the output
explosion is the dim-64 noise floor (threshold 0.4 ~ 3.2 sigma);
at real-embedding geometry (dim >= 768, threshold ~0.9) the
pass-rate term vanishes and output tracks true duplication." This tool
MEASURES that claim instead: it synthesizes a deterministic corpus with
real-model geometry — ambient dim 768, seeded low-rank latent structure
(rank 128: real text embeddings concentrate on a low-dimensional
manifold), planted near-dup pairs at cosine ~0.95 with fixed density
1/DUP_EVERY — and runs d18's exact operator pipeline
(sampled_centroids -> two-level IVF assign -> (label x cell)-blocked
pair stage) at threshold 0.9 across two decades.

What the numbers must show if the adjudication was right:
- output pairs track PLANTED density: ~n/DUP_EVERY found pairs at
  every scale (output ratio ~10x per decade, no explosion);
- planted-pair recall decays only slowly as the corpus-scaled cell
  count grows (the sole loss mechanism is a planted pair straddling a
  cell boundary, and boundaries multiply with k — the SemDeDup recall
  tradeoff, not a threshold artifact; measured 0.63 at k=78, 0.46 at
  k=781);
- runtime decade ratio is the candidate-linear one (cells scale as
  n/256, so per-cell population — and with it candidate pairs per
  vector — stays bounded).

Synthesis is fully deterministic (numpy Philox counter-based streams
keyed by vec_id; no wall-clock, no global RNG) and row-local (each
doc's latent derives from its own id; a planted dup re-derives its
HEAD's latent and perturbs it), so any scale regenerates bit-identical
without a join against the base corpus.

Geometry: v = normalize(M @ z), M a fixed seeded 768x128 matrix,
z ~ N(0, I_128). Cross-doc cosines concentrate like 128-dim random
directions (std ~ 1/sqrt(128) ~ 0.088, same-argmax-cell conditioning
elevates expected cosine by ~2 ln k / 128 ~ 0.14 at k ~ 8k), so the
0.9 threshold sits ~8.6 sigma above the elevated cell mean — the
pass-rate term the dim-64 fixture could not kill. Planted pairs:
z_dup = z + EPS * |z|/|w| * w with w an independent seeded direction,
giving cos ~ 1/sqrt(1 + EPS^2) ~ 0.95 at EPS = 0.33 (ambient cosine
matches latent cosine to ~1/sqrt(768) because M's columns are
near-orthogonal at this aspect ratio).

Usage::

    python tools/realdim_bench.py              # synthesize + run 1x/10x/100x
    python tools/realdim_bench.py --synth-only
    python tools/realdim_bench.py --run-only   # reuse datasets
    python tools/realdim_bench.py --scales 1,10

Appends a section to SCALE_BENCH.md and writes raw numbers to
.scale_data/realdim.json. Timing runs must be SOLO (host noise rules).
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from es_to_clickhouse_spark.session import get_spark  # noqa: E402

DIM = 768
RANK = 128
DUP_EVERY = 10  # ids with id % DUP_EVERY == DUP_EVERY-1 near-dup their id-1
N_LABELS = 8
EPS = 0.33  # planted perturbation: cos ~ 1/sqrt(1+EPS^2) ~ 0.95
M_SEED = 20260816
BASE_N = 20_000
SCALES = (1, 10, 100)
THRESHOLD = 0.9
WARM_PASSES = 2
DATA_DIR = os.path.join(ROOT, ".scale_data", "realdim")


def synth_realdim(spark, n: int, dst: str) -> None:
    """Deterministic low-rank real-geometry corpus of ``n`` vectors at
    ``dst`` (schema matches the testdata embeddings table: vec_id,
    embedding array<float>, label int)."""
    import numpy as np

    n_parts = spark.sparkContext.defaultParallelism * 4
    mix = np.random.Generator(np.random.Philox(key=M_SEED)).standard_normal(
        (RANK, DIM)
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            z = np.empty((len(ids), RANK))
            for i, vid in enumerate(ids):
                head = vid - 1 if vid % DUP_EVERY == DUP_EVERY - 1 else vid
                zi = np.random.Generator(
                    np.random.Philox(key=int(head))
                ).standard_normal(RANK)
                if head != vid:  # planted near-dup of its head
                    w = np.random.Generator(
                        np.random.Philox(key=int(vid) + (1 << 40))
                    ).standard_normal(RANK)
                    zi = zi + EPS * (
                        np.linalg.norm(zi) / np.linalg.norm(w)
                    ) * w
                z[i] = zi
            v = z @ mix  # (batch, DIM)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": list(v.astype(np.float32)),
                    "label": ((ids // DUP_EVERY) % N_LABELS).astype(np.int32),
                }
            )

    spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(dst)
    got = spark.read.parquet(dst).count()
    assert got == n, f"{dst}: {got} != {n}"
    print(f"synth realdim n={n:,} -> {dst}", flush=True)


def d18_pipeline(spark, src: str):
    """d18's exact operator composition (corpus/llm.py
    d18_embedding_neardup_cell, assign tier-routed by ivf_assign_auto's
    work rule k*dim <= 200k: dense at 20k (78*768 = 60k), two-level at
    200k (781*768 = 600k) and 2M (7,812*768)), at the real-embedding
    threshold."""
    from es_to_clickhouse_spark.operators.dedup import embedding_neardup_pairs
    from es_to_clickhouse_spark.operators.similarity import (
        ivf_assign_auto,
        sampled_centroids,
    )

    emb = spark.read.parquet(src)
    cents = sampled_centroids(emb)
    cell = ivf_assign_auto(emb, cents).select("vec_id", "cent_id")
    base = emb.join(cell, "vec_id").withColumn(
        "_blk",
        F.concat(F.col("label"), F.lit("|"), F.col("cent_id").cast("string")),
    )
    k_cells = max(8, emb.count() // 256)
    return embedding_neardup_pairs(
        base, "vec_id", "embedding", "_blk", threshold=THRESHOLD,
        n_blocks_hint=k_cells,
    )


def measure(spark, n: int, src: str) -> dict:
    t0 = time.monotonic()
    pairs = d18_pipeline(spark, src).localCheckpoint()
    out_rows = pairs.count()
    cold = time.monotonic() - t0
    # dim 768 makes the interpreted dot folds ~12x the dim-64 decades:
    # one warm pass at the 2M scale (the cold pass brackets it; a
    # multi-pass min would buy precision the ~15-min pass can't afford)
    passes = WARM_PASSES if n < 1_000_000 else 1
    warms = []
    for _ in range(passes):
        t0 = time.monotonic()
        d18_pipeline(spark, src).write.format("noop").mode(
            "overwrite"
        ).save()
        warms.append(time.monotonic() - t0)
    # planted-pair recall: the fixture plants (id-1, id) for every
    # id % DUP_EVERY == DUP_EVERY-1; every other output pair is noise
    planted_found = pairs.where(
        (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_b") % DUP_EVERY == DUP_EVERY - 1)
    ).count()
    planted_total = n // DUP_EVERY
    rec = {
        "n": n,
        "sec": round(min(warms), 3),
        "cold": round(cold, 3),
        "rows": out_rows,
        "planted_total": planted_total,
        "planted_found": planted_found,
        "recall": round(planted_found / planted_total, 4),
        "noise_pairs": out_rows - planted_found,
    }
    print(f"  n={n:,}: {rec}", flush=True)
    return rec


def write_report(results: dict[int, dict]) -> None:
    lines = [
        "",
        "## Real-embedding geometry for the near-dup family "
        "(r13, tools/realdim_bench.py)",
        "",
        "The d6/d18 1000x output explosions were ADJUDICATED as the",
        "dim-64 noise floor (threshold 0.4 ~ 3.2 sigma admits more of",
        "the elevated same-cell cosine distribution as k grows) with the",
        "claim that real-embedding geometry kills the term. This table",
        "measures that claim: dim 768, rank-128 latent structure,",
        f"planted near-dups at cos ~0.95 every {DUP_EVERY} docs, d18's",
        f"exact (label x IVF-cell) pipeline at threshold {THRESHOLD}",
        "(~8.6 sigma above the elevated cell mean). Warm min of "
        f"{WARM_PASSES}, solo JVM.",
        "",
        "| scale | n | sec | decade ratio | output pairs | planted found"
        " / total | recall | noise pairs |",
        "|---|---|---|---|---|---|---|---|",
    ]
    prev = None
    for s in sorted(results):
        r = results[s]
        ratio = f"{r['sec'] / prev['sec']:.1f}x" if prev else "—"
        lines.append(
            f"| {s}x | {r['n']:,} | {r['sec']} | {ratio} | {r['rows']:,} |"
            f" {r['planted_found']:,} / {r['planted_total']:,} |"
            f" {r['recall']} | {r['noise_pairs']:,} |"
        )
        prev = r
    lines += [
        "",
        "Reading: output tracks PLANTED density (x10 per decade) when",
        "noise pairs stay ~0 and recall is scale-invariant — the",
        "candidate-linear regime. Recall below 1.0 is planted pairs",
        "straddling an IVF cell boundary (the SemDeDup tradeoff d18",
        "accepts by design; sim11 quantifies it per cell), NOT a",
        "threshold artifact. Any output ratio far above 10x per decade",
        "would re-open the d18 adjudication.",
        "",
    ]
    with open(os.path.join(ROOT, "SCALE_BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    os.makedirs(os.path.join(ROOT, ".scale_data"), exist_ok=True)
    with open(os.path.join(ROOT, ".scale_data", "realdim.json"), "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f, indent=1)
    print("SCALE_BENCH.md section + .scale_data/realdim.json written",
          flush=True)


def main() -> None:
    argv = sys.argv[1:]
    scales = (
        tuple(int(s) for s in argv[argv.index("--scales") + 1].split(","))
        if "--scales" in argv
        else SCALES
    )
    # the 100x corpus is 2M x 768 floats (~12 GB of raw vectors) in ONE
    # local JVM with 32 executor threads — the 8g default heap OOMs in
    # the parquet scan before any operator runs
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark("realdim_bench")
    spark.sparkContext.setLogLevel("ERROR")
    for s in scales:
        dst = os.path.join(DATA_DIR, f"x{s}", "embeddings.parquet")
        if "--run-only" not in argv and not os.path.exists(dst):
            synth_realdim(spark, BASE_N * s, dst)
    if "--synth-only" in argv:
        return
    results = {}
    for s in scales:
        dst = os.path.join(DATA_DIR, f"x{s}", "embeddings.parquet")
        print(f"=== {s}x ===", flush=True)
        results[s] = measure(spark, BASE_N * s, dst)
    write_report(results)


if __name__ == "__main__":
    main()
