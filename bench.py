"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (full distributed
compute, no driver-side materialization cost), after a warm-up of the JVM
with a trivial job. Timings are per-query wall clock.

Attributability (round 4): earlier rounds showed ±30 % total swings on an
UNCHANGED hot path — min-of-3 on a shared host cannot tell a regression
from scheduling noise. Now each query runs 5 warm passes; the headline is
the per-query MEDIAN (robust to one slow pass, unlike min it doesn't hide
a real slowdown behind one lucky pass), and the JSON carries min/stddev
per query plus the pinned cpu count. Any query whose median regresses
>1.5x against the best prior round's recording (BENCH_r*.json) is listed
in "regressions" and warned on stderr, so a regression is attributable to
the round that introduced it instead of drowning in noise.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from es_to_clickhouse_spark.corpus import all_queries
from es_to_clickhouse_spark.session import DEFAULT_CPUS, get_spark

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

#: heavy set (round 5): the corpus's top measured cost centers at sf0.1 —
#: round 4's biggest wins (d5 57s → 13.7s salted unskew, d12 pinned
#: repartition, txt10 parallel 8-gram hashing) were INVISIBLE to the
#: frozen r1 headline above; tracking them separately makes a future
#: regression in the real hot spots attributable. Kept out of the
#: original set so `value` stays round-over-round comparable to r1.
HEAVY = [
    "d5_ngram_jaccard_pairs",
    "d12_minhash_estimate_error",
    "txt10_contamination_check",
    "b5_session_duration_stats",
    "dq6_json_key_profile",
    "sim6_knn_graph",
    "rj2_interval_coverage",
    "g1_pagerank_trade",
    "pk1_context_pack",
    "w8_moving_sum_rows",
    # r5 additions: a full 201-query timing sweep found the iterative
    # CC pipelines (d9/d10) were the true top cost centers, invisible
    # to both the r1 headline and the r4 heavy list
    "d9_dup_clusters",
    "d10_retention_policy",
    "txt5_bigram_topk",
    "d6_embedding_neardup",
    # new r5 operators that land in the top tier (measured sf0.1):
    # SemDeDup's in-cell pair+CC composition (5.4 s) and the BFS
    # decontamination closure over the LSH pipeline (2.6 s)
    "d14_semantic_dedup",
    "g3_contamination_bfs",
    # Bellman-Ford edges = a TPC-H-class 5-table join + 4 relaxation
    # rounds (2.8 s warm at sf0.1)
    "g4_cheapest_route",
    # all-pairs jaccard audit stage, salted constant-block (2.6 s warm)
    "d17_signal_agreement",
    # r11: incremental near-dup screen against the LSH store (1.4 s
    # warm at sf0.1; no prior rounds — baseline starts at r11)
    "d19_incremental_neardup",
    # r12 (judge r11 #3): the at-scale label×IVF-cell near-dup — the
    # production replacement for d6's in-label all-pairs (717 s vs
    # 9.1 s at the 100x decade). Tracking it here makes the variant
    # users should run the one whose cost the gate watches.
    "d18_embedding_neardup_cell",
    # r14 (judge r13 #5): the two r13 additions with nontrivial big-
    # table shuffles — the chain-join prefix-fidelity scan and the
    # two-shuffle gram-novelty curve — were invisible to the gate.
    "emb3_matryoshka_fidelity",
    "txt21_ngram_novelty",
]

WARM_PASSES = 5
#: heavy queries cost 2-14 s each at sf0.1; 3 warm passes bound the added
#: bench wall-clock (~1.5 min) while still giving a median + spread
HEAVY_WARM_PASSES = 3
REGRESSION_FACTOR = 1.5

#: The regression baseline looks back this many recorded rounds. An
#: all-time best-ever prior is the wrong baseline on a shared host: one
#: lucky fast-day recording (g4 1.44 s in r7-era vs ~2.1 s measured by
#: driver, builder AND judge in every round since) permanently flags
#: stable code, and no noise-floor normalization can repair it because
#: the light floor query doesn't share the heavy queries' burst
#: exposure. A recent window still catches what the gate exists for —
#: a regression introduced THIS round — while letting a one-time
#: outlier age out. (A slow multi-round creep can in principle walk
#: under it; the scale benches, not this gate, own that risk.)
PRIOR_WINDOW = 5

#: Floor-normalization is asymmetric under burst: a prior round whose
#: LIGHT floor query caught bursts records an inflated floor (r9:
#: 0.626 vs the 0.30-0.47 every other round measures) while its heavy
#: timings barely moved — scaling those priors DOWN by the full floor
#: ratio (x0.64) manufactures a baseline faster than any round ever
#: measured raw, and stable code flags forever (r11: g4/d17 at a
#: uniform 1.5-1.8x, reproduced by driver, builder and judge). Clamp
#: the down-scaling direction: assume a prior host was at most 1/0.8 =
#: 1.25x slower than the floor ratio claims. Up-scaling (today's host
#: slower — the r8 false-flag direction) stays unclamped.
DOWNSCALE_CLAMP = 0.8

#: Baseline resets (judge r9 dq6 adjudication): {query: first_valid_round}.
#: When a query's plan is DELIBERATELY rewritten for scale at a small-SF
#: cost, priors recorded BEFORE the rewrite measure a plan that no longer
#: exists — comparing the new plan against them re-fires the same flag
#: every round. Entries here skip BENCH_r{N}.json recordings with
#: N < first_valid_round for that query; the reset is visible in-repo and
#: adjudicated in the round's VERDICT, never silent.
BASELINE_RESETS: dict[str, int] = {
    # r9 rewrote the key-profile to a two-level (k,val)/(k,user) agg:
    # 12.3x→7.1x at 10x data, at the cost of one extra exchange at sf0.1
    # (fresh-session solo re-measure, r10: median 2.49 s / min 1.78 s on
    # that day's host vs the old plan's 0.83 s normalized best). The old
    # single-exchange plan's priors are not this plan's baseline.
    "dq6_json_key_profile": 9,
    # r10 made d14's IVF cell count scale with the corpus (max(8, n/256)
    # both sides of the oracle) — the deliberate cost of the second-
    # decade fix (59.7x -> 10.7x at 100x data); r11 additionally routed
    # the assign through the two-level quantizer (O(N*sqrt(k)) instead
    # of the dense N x k matrix); r12 replaced the dense-id-assuming
    # `vec_id < n/256` centroid rule with the hash-sampled
    # density-independent one (sampled_centroids — the third-decade
    # 23.6x autopsy, SCALE_BENCH.md r12), which changes the centroid
    # set and therefore the measured plan again.
    "d14_semantic_dedup": 12,
    # r11 replaced sim6's corpus-scaled probe predicate (vec_id % 25 —
    # O(N^2/25) probe x corpus work, DNF at the 100x decade) with a
    # fixed 24-probe hash top-K. Probe-set SIZE and membership changed,
    # so prior timings measure a different workload.
    "sim6_knn_graph": 11,
    # r11 NEW operator (incremental near-dup vs the LSH store); r12
    # redesigned the shared screen (store-side dedupe for re-ingest
    # idempotency, broadcast semi-prune of the store bucket scan to the
    # batch's band keys, lazy checkpoints so the store scans once) — a
    # deliberate fixed overhead at sf0.1 (~1.9 s vs 1.4 s) for the
    # at-scale win (1000x: 37.4 s vs 38.1 s with ONE store scan and a
    # batch-pruned read; SCALE_BENCH.md r12). The old screen's priors
    # are not this plan's baseline.
    "d19_incremental_neardup": 12,
    # r12 adds d18 to the heavy set (judge r11 #3 — track the at-scale
    # near-dup variant, not just the d6 baseline): the r12 driver bench
    # seeds its baseline. r14 rewired its blocking through the
    # quantizer-split multi-probe (recall 0.37 -> measured lift at 2M,
    # SCALE_BENCH.md r14) — ~4x candidate pairs at sf0.1 by design, so
    # single-probe priors measure a plan that no longer exists.
    "d18_embedding_neardup_cell": 14,
    # r14 adds the two shuffle-heavy r13 queries to the heavy set
    # (judge r13 #5): the r14 recordings seed their baselines.
    "emb3_matryoshka_fidelity": 14,
    "txt21_ngram_novelty": 14,
}


def _timing_maps(rec: dict) -> list[dict]:
    """Extract every {query: seconds} timing map from one BENCH_r*.json
    record, whatever its shape:

    - a direct run of this script: flat {"queries": ..., "heavy_queries": ...}
    - the driver's wrapper with "parsed" set: same maps under rec["parsed"]
    - the driver's wrapper with "parsed": null and only a TRUNCATED
      stdout "tail" string (rounds 4-5 were recorded this way — the
      JSON line's head is cut off, so json.loads can't parse it, but
      the per-key maps are flat {name: number} objects that a regex
      recovers intact). Silently dropping these erased the heavy-set
      baseline, which is exactly what the regression gate exists to
      prevent — hence the salvage path + its unit test
      (tests/test_properties.py::test_bench_prior_parser_*).
    - the driver's tail truncated MID-MAP (r11: the tail starts inside
      the "heavy_queries" median map, so neither median-map key
      survives) — fall back to the complete "*_min" maps further down
      the line. A min-basis prior is valid, just slightly tight:
      best_prior_per_query already takes the min across rounds, so a
      per-round min only tightens the same bound it was already
      computing (judge r11 #1 prescribed exactly this salvage).
    """
    import re

    flat = rec.get("parsed") or rec
    maps = []
    for key in ("queries", "heavy_queries"):
        m = flat.get(key)
        if isinstance(m, dict) and m:
            maps.append(m)
    if not maps and isinstance(rec.get("tail"), str):
        # median maps first; min maps only if no median map survived the
        # truncation (min-basis priors are tighter, never looser).
        for keys in (("queries", "heavy_queries"),
                     ("queries_min", "heavy_queries_min")):
            for key in keys:
                # flat map of "name": number — no nested braces by
                # construction (the quote+colon anchors keep "queries"
                # from matching inside "heavy_queries"/"queries_min")
                hit = re.search(r'"%s":\s*(\{[^{}]*\})' % key, rec["tail"])
                if hit:
                    try:
                        maps.append(json.loads(hit.group(1)))
                    except ValueError:
                        pass
            if maps:
                break
    return maps


#: rows for the compute-bound calibration sample (judge r12 item 3).
#: The w1 noise floor is a ~0.3 s scheduler-bound query — it was stable
#: in every r12 run while the heavy phase ran 1.3x apart, because a
#: short query never feels sustained 32-core contention or GC pressure.
#: This calibration job is the opposite: a fixed data-independent
#: whole-stage-codegen aggregate sized to ~2-3 s of saturated all-core
#: compute, so its cross-round ratio tracks the machine speed the HEAVY
#: set actually experiences. Identical code every round — same contract
#: as the w1 floor.
COMPUTE_CAL_ROWS = 9_000_000_000
COMPUTE_CAL_PASSES = 3


def _compute_cal_passes(spark, n: int) -> list[float]:
    out = []
    for _ in range(n):
        t0 = time.time()
        # (id % p) first keeps the product inside int64 under ANSI mode
        # at any row count; the sum of COMPUTE_CAL_ROWS (9e9) values
        # each < 1e6 stays < 9e15 << int64 max.
        spark.range(COMPUTE_CAL_ROWS, numPartitions=DEFAULT_CPUS).selectExpr(
            "sum((id % 1000003) * 2654435761 % 1000003) as s"
        ).collect()
        out.append(time.time() - t0)
    return out


def _compute_floor_median(rec: dict) -> float | None:
    """Extract a round's recorded compute-bound calibration median
    (present since r13) from parsed, flat, or truncated-tail records.
    Returns None for pre-r13 records — callers fall back to the w1
    floor ratio for those."""
    import re

    flat = rec.get("parsed") or rec
    cf = flat.get("compute_floor")
    if isinstance(cf, dict) and isinstance(cf.get("median"), (int, float)):
        return float(cf["median"]) or None
    # compact stdout records (r15+) carry the median as a flat scalar
    if isinstance(flat.get("compute_floor_median"), (int, float)):
        return float(flat["compute_floor_median"]) or None
    if isinstance(rec.get("tail"), str):
        hit = re.search(
            r'"compute_floor":\s*\{[^{}]*"median":\s*([0-9.]+)', rec["tail"]
        ) or re.search(r'"compute_floor_median":\s*([0-9.]+)', rec["tail"])
        if hit:
            return float(hit.group(1)) or None
    return None


def _noise_floor_median(rec: dict) -> float | None:
    """Extract a round's recorded noise-floor median (the fixed noise
    query's median, present since r6) from whatever shape the record
    took — parsed, flat, or the truncated-tail salvage path."""
    import re

    flat = rec.get("parsed") or rec
    nf = flat.get("noise_floor")
    if isinstance(nf, dict) and isinstance(nf.get("median"), (int, float)):
        return float(nf["median"]) or None
    # compact stdout records (r15+) carry the median as a flat scalar
    if isinstance(flat.get("noise_floor_median"), (int, float)):
        return float(flat["noise_floor_median"]) or None
    if isinstance(rec.get("tail"), str):
        hit = re.search(
            r'"noise_floor":\s*\{[^{}]*"median":\s*([0-9.]+)', rec["tail"]
        ) or re.search(r'"noise_floor_median":\s*([0-9.]+)', rec["tail"])
        if hit:
            return float(hit.group(1)) or None
    return None


def best_prior_per_query(
    here: str,
    current_floor: float | None = None,
    current_compute: float | None = None,
) -> dict[str, float]:
    """Per-query best (lowest) recorded timing across all prior rounds'
    BENCH_r*.json — the baseline a median must not exceed by >1.5x.

    ``current_floor`` (this run's noise-floor median) enables MACHINE
    NORMALIZATION (r8 VERDICT #5): each prior round's timings are
    rescaled by current_floor / that_round's_floor before taking the
    min, so the comparison happens in same-machine units. Without it a
    1.5x-slower host day flagged 19 false regressions on an unchanged
    hot path (r8): the code didn't get slower, the machine did, and the
    noise query — identical code every round — says by exactly how
    much. Rounds that predate the floor recording (r1-r5) are scaled by
    current_floor / the SMALLEST recorded floor across rounds (r9 fix:
    leaving them unscaled let their fast-day minima win the baseline
    min and re-manufacture every false regression the normalization
    was built to kill — observed as normalized == raw on 27 entries).
    A faster current machine scales priors DOWN (the gate gets stricter
    on a quiet day — that's the point).

    BASELINE_RESETS filter: a query whose plan was deliberately
    rewritten (see the table) ignores recordings from rounds BEFORE its
    reset round — those measured a plan that no longer exists.

    PRIOR_WINDOW filter: only the most recent PRIOR_WINDOW recorded
    rounds feed the baseline (see the constant's comment — an all-time
    best-ever prior lets one fast-day outlier permanently flag stable
    code)."""
    import re

    recs = []
    floors = []
    rounds_seen = []
    # Two sources, same schema: the driver's BENCH_r{N}.json (whose
    # 2000-char stdout tail can truncate ANY map — r11 cut mid-median-map,
    # r12's tail started inside heavy_queries_stddev and held no complete
    # flat map at all) and the builder's committed bench_r{N}_local.json
    # recordings, which are complete JSON with the same keys and floor
    # record. Reading both means a truncated driver artifact can no
    # longer erase a round's baseline (judge r12 #1): the local recording
    # for the same round supplies the intact maps.
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))) + sorted(
        glob.glob(os.path.join(here, "bench_r*_local.json"))
    )
    for path in paths:
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        hit = re.search(
            r"(?:BENCH_r(\d+)\.json|bench_r(\d+)_local\.json)$", path
        )
        rnd = int(hit.group(1) or hit.group(2)) if hit else None
        recs.append((rec, _noise_floor_median(rec), rnd, _compute_floor_median(rec)))
        if rnd is not None:
            rounds_seen.append(rnd)
    window = set(sorted(set(rounds_seen))[-PRIOR_WINDOW:])
    recs = [r for r in recs if r[2] is None or r[2] in window]
    for _, floor, _, _ in recs:
        if floor:
            floors.append(floor)
    fallback_floor = min(floors) if floors else None
    heavy_set = set(HEAVY)
    best: dict[str, float] = {}
    for rec, floor, rnd, compute in recs:
        scale = 1.0
        if current_floor and (floor or fallback_floor):
            # clamped downward: see DOWNSCALE_CLAMP for why a full
            # floor-ratio down-scale over-corrects under burst
            scale = max(
                current_floor / (floor or fallback_floor), DOWNSCALE_CLAMP
            )
        # Heavy-set scale (judge r12 item 3): the scheduler-bound w1
        # floor under-corrects sustained 32-core load — r12's three runs
        # all had stable w1 floors while the heavy phase ran 1.3x apart
        # and 9 untouched queries false-flagged. When BOTH this run and
        # the prior round recorded the compute-bound calibration, scale
        # heavy-set priors by THAT ratio instead; pre-r13 records fall
        # back to the w1 ratio above.
        heavy_scale = scale
        if current_compute and compute:
            heavy_scale = max(current_compute / compute, DOWNSCALE_CLAMP)
        for timing_map in _timing_maps(rec):
            for name, sec in timing_map.items():
                reset = BASELINE_RESETS.get(name)
                if reset is not None and rnd is not None and rnd < reset:
                    continue  # pre-rewrite plan: not this plan's baseline
                if isinstance(sec, (int, float)) and sec > 0:
                    s = heavy_scale if name in heavy_set else scale
                    best[name] = min(
                        best.get(name, float("inf")), float(sec) * s
                    )
    return best


#: passes used by the fresh-JVM re-measure of flagged queries
REMEASURE_PASSES = 3
REMEASURE_NOISE_PASSES = 4


def remeasure_main(names: list[str]) -> None:
    """Child mode (``--remeasure q1,q2,...``): re-time ONLY the given
    queries in THIS fresh JVM, plus the noise query for machine
    normalization, and print one JSON line. The parent launches this
    AFTER stopping its own Spark, so the child runs solo — the protocol
    SCALE_BENCH.md prescribed manually for bursty-host flags, automated
    (VERDICT r10 item 5)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def passes(name: str, n: int) -> list[float]:
        fn = qs[name]
        out = []
        for _ in range(n + 1):  # +1 cold, dropped
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
        return out[1:]

    noise = passes("w1_latest_per_key", REMEASURE_NOISE_PASSES)
    compute = _compute_cal_passes(spark, COMPUTE_CAL_PASSES)
    result = {
        "noise_median": round(statistics.median(noise), 3),
        "compute_median": round(statistics.median(compute), 3),
        "remeasured": {},
    }
    for name in names:
        if name not in qs:
            continue
        warms = passes(name, REMEASURE_PASSES)
        result["remeasured"][name] = {
            "min": round(min(warms), 3),
            "median": round(statistics.median(warms), 3),
        }
    print(json.dumps(result))


#: width of the borderline band above the regression gate: a remeasured
#: min within this factor of the gate gets a SECOND independent child
#: pass, and if still over the gate the verdict is "borderline", never
#: "real" (judge r13 #3: b5's r13 "real" was decided by 0.005 s — 0.8%
#: over the gate — and exonerated by the judge's clean run at 1.22x; a
#: knife-edge overshoot must not produce the same verdict word as a 3x
#: blowout). "real" is reserved for overshoots past gate * BAND.
BORDERLINE_BAND = 1.15


def _gate_verdict(rm_min: float, base: float | None) -> str:
    """Pure verdict rule for a solo remeasured min vs the child-floor-
    normalized prior: noise at or under the gate, borderline inside
    the band above it, real only past the band."""
    if not base or rm_min <= REGRESSION_FACTOR * base:
        return "noise"
    if rm_min <= REGRESSION_FACTOR * BORDERLINE_BAND * base:
        return "borderline"
    return "real"


def _remeasure_child(names: list[str], here: str, timeout_s: int):
    """One solo fresh-JVM child pass over ``names``; returns the parsed
    child record plus its floor-normalized priors."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "--remeasure",
            ",".join(names),
        ],
        capture_output=True,
        text=True,
        timeout=timeout_s,
        cwd=here,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    child = json.loads(line)
    prior = best_prior_per_query(
        here,
        current_floor=child.get("noise_median"),
        current_compute=child.get("compute_median"),
    )
    return child, prior


def adjudicate_flags(
    regressions: dict, here: str, timeout_s: int = 900
) -> None:
    """Fresh-JVM re-measure of every flagged query, in a SOLO child
    process (the parent's Spark is already stopped). Each flag entry
    gains ``remeasured``/``remeasured_median`` and a ``verdict``:
    ``noise`` when the solo min clears the gate against priors
    re-normalized to the CHILD's own noise floor, ``real`` when it
    exceeds the gate by more than BORDERLINE_BAND, ``borderline`` when
    it lands between — after a SECOND independent child pass whose min
    is pooled (two fresh JVMs both landing over the gate is evidence;
    one landing 0.8% over is not — judge r13 #3). ``unadjudicated``
    when the child failed. A bursty-host run thus produces a
    machine-readable verdict per flag without a human re-run."""
    try:
        child, prior_child = _remeasure_child(
            list(regressions), here, timeout_s
        )
    except Exception as e:  # child crash/timeout: flags stay, marked
        for entry in regressions.values():
            entry["verdict"] = "unadjudicated"
            entry["remeasure_error"] = repr(e)[:200]
        return
    child_floor = child.get("noise_median")
    second: list[str] = []
    for name, entry in regressions.items():
        rm = child.get("remeasured", {}).get(name)
        if not rm:
            entry["verdict"] = "unadjudicated"
            continue
        entry["remeasured"] = rm["min"]
        entry["remeasured_median"] = rm["median"]
        entry["remeasured_floor"] = child_floor
        entry["verdict"] = _gate_verdict(rm["min"], prior_child.get(name))
        if entry["verdict"] in ("borderline", "real"):
            # near-gate (borderline) or a first-pass blowout: one more
            # independent JVM — a blowout that was host burst dissolves,
            # a real regression reproduces
            second.append(name)
    if not second:
        return
    try:
        child2, prior2 = _remeasure_child(second, here, timeout_s)
    except Exception:
        return  # first-pass verdicts stand (borderline never upgraded)
    for name in second:
        rm2 = child2.get("remeasured", {}).get(name)
        if not rm2:
            continue
        entry = regressions[name]
        entry["remeasured_second"] = rm2["min"]
        v2 = _gate_verdict(rm2["min"], prior2.get(name))
        # pool the passes: the BETTER (lower-severity) verdict wins —
        # min over independent solo JVMs is the estimator everywhere
        # else in this file
        order = {"noise": 0, "borderline": 1, "real": 2}
        if order[v2] < order[entry["verdict"]]:
            entry["verdict"] = v2
            entry["remeasured"] = min(entry["remeasured"], rm2["min"])


def compact_line(full: dict) -> str:
    """The one-line stdout contract, printed LAST and kept COMPACT
    (< 2000 chars: the contract fields + per-query medians + scalar
    summaries + per-flag verdicts). The round artifact keeps only the
    last 2000 chars of stdout, and r13's ~6 KB single line truncated
    past recovery — the entire r13->r14 round-over-round comparison was
    lost to it (judge r14 #2). Optional keys are dropped in order if
    the line would ever outgrow the tail window; the contract fields
    (metric/value/unit/queries/sf) never are."""
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": full["unit"],
        "queries": full["queries"],
        "sf": full["sf"],
        "cpus": full["cpus"],
        "warm_passes": full["warm_passes"],
        "min_total": full["min_total"],
        "heavy_total": full["heavy_total"],
        "heavy_min_total": full["heavy_min_total"],
        "heavy_warm_passes": full["heavy_warm_passes"],
        "floor_stable": full["floor_stable"],
        "noise_floor_median": full["noise_floor"]["median"],
        "compute_floor_median": full["compute_floor"]["median"],
        "n_flags": len(full["regressions"]),
        "flag_verdicts": {
            n: e.get("verdict", "?") for n, e in full["regressions"].items()
        },
    }
    line = json.dumps(compact)
    for drop in ("flag_verdicts", "heavy_warm_passes", "warm_passes",
                 "heavy_min_total", "min_total"):
        if len(line) < 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact)
    return line


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--remeasure":
        remeasure_main([n for n in sys.argv[2].split(",") if n])
        return
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

    # Per query: one cold pass (plan compile + codegen + file listing —
    # amortizes to zero at production scale), then WARM_PASSES timed warm
    # passes. Median is the headline estimator; min and stddev ride along
    # so a reader can separate "machine was noisy" (big stddev, min far
    # below median) from "query got slower" (min itself moved).
    def run_set(names: list[str], passes: int):
        timings: dict[str, float] = {}
        mins: dict[str, float] = {}
        stddevs: dict[str, float] = {}
        cold: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)
            warms = []
            for _ in range(passes):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                warms.append(time.time() - t0)
            timings[name] = round(statistics.median(warms), 3)
            mins[name] = round(min(warms), 3)
            stddevs[name] = round(statistics.pstdev(warms), 3)
        return timings, mins, stddevs, cold

    # Noise floor (r6 VERDICT #5): the same fixed query, repeated with
    # NO code change, brackets the whole bench — half the passes before
    # the sets run, half after — so its spread captures both fast
    # scheduling jitter and slow host drift across the bench window.
    # A future round's per-query delta smaller than ~3x the relative
    # floor is host noise, not a regression, at a glance.
    NOISE_QUERY = "w1_latest_per_key"
    NOISE_PASSES = 6
    #: each floor SAMPLE is the median of this many back-to-back passes
    #: (r11 VERDICT #6): a raw single-pass sample mixes the machine's
    #: speed with one-off GC/scheduler spikes — on a ~0.4 s query a
    #: single spiked pass blew the min-to-max spread past 0.8 on EVERY
    #: recorded r10/r11 run, so floor_stable had never been true even
    #: on an idle host and the gate leaned entirely on the child-JVM
    #: re-measure. A per-sample median absorbs one spike per triple
    #: while a SUSTAINED burst (the thing the gate exists to catch —
    #: r9's external load ~5) still lifts whole samples and trips the
    #: spread. The floor stays w1's median, so cross-round floor ratios
    #: (machine normalization) remain comparable with r6-r11 records.
    NOISE_INNER = 3

    def noise_passes(n: int) -> list[float]:
        out = []
        fn = qs[NOISE_QUERY]
        for _ in range(n):
            inner = []
            for _ in range(NOISE_INNER):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                inner.append(time.time() - t0)
            out.append(statistics.median(inner))
        return out

    noise_passes(1)  # warm-up: plan compile + codegen, discarded
    noise = noise_passes(NOISE_PASSES // 2)

    timings, mins, stddevs, cold = run_set(HEADLINE, WARM_PASSES)
    # Compute-bound calibration brackets the HEAVY phase the way the w1
    # floor brackets the whole bench: half the samples before, half
    # after, so sustained host load DURING the heavy window lands in the
    # median (judge r12 item 3 — the w1 floor was stable in all three
    # r12 runs while the heavy phase ran 1.3x apart).
    compute = _compute_cal_passes(spark, 2)
    h_timings, h_mins, h_stddevs, h_cold = run_set(HEAVY, HEAVY_WARM_PASSES)
    compute += _compute_cal_passes(spark, 2)
    compute_med = statistics.median(compute)
    compute_floor = {
        "rows": COMPUTE_CAL_ROWS,
        "passes": len(compute),
        "median": round(compute_med, 3),
        "stddev": round(statistics.pstdev(compute), 3),
        "spread": round((max(compute) - min(compute)) / compute_med, 3)
        if compute_med
        else None,
    }

    noise += noise_passes(NOISE_PASSES // 2)
    noise_med = statistics.median(noise)
    noise_floor = {
        "query": NOISE_QUERY,
        "passes": len(noise),
        "inner": NOISE_INNER,
        "median": round(noise_med, 3),
        "stddev": round(statistics.pstdev(noise), 3),
        "rel": round(statistics.pstdev(noise) / noise_med, 3) if noise_med else None,
        "spread": round((max(noise) - min(noise)) / noise_med, 3) if noise_med else None,
    }

    here = os.path.dirname(os.path.abspath(__file__))
    # machine-normalized baseline (r8 VERDICT #5): priors are rescaled
    # to THIS machine's speed via the noise-floor ratio before the 1.5x
    # gate, so a slow host day can't manufacture false regressions (r8:
    # 19 of them on an unchanged hot path). The raw best rides along in
    # each regression record so a reader can see both frames.
    prior = best_prior_per_query(
        here, current_floor=noise_med, current_compute=compute_med
    )
    prior_raw = best_prior_per_query(here)
    # The gate compares this run's MIN, not its median: on a shared
    # bursty host (r9: load ~5 from outside the container with zero
    # local JVMs) the median measures the neighbors while the min —
    # the least-contended pass — measures the code. A real code
    # regression raises the min too; a noisy-neighbor burst does not.
    all_mins = {**mins, **h_mins}
    # A floor whose relative stddev exceeds 0.5 OR whose min-to-max
    # spread exceeds 0.8x its median means the host was BURSTY across
    # the bench window (r9: rel 0.855 at external load ~5 with zero
    # local JVMs; r10: rel 0.381 passed while spread 0.94 exposed the
    # same burst — the floor got lucky passes, the heavy queries got
    # the bursts, and six untouched queries false-flagged) — the
    # machine-speed estimate itself is then unreliable, so flags are
    # recorded but marked.
    floor_stable = (noise_floor.get("rel") or 0) <= 0.5 and (
        noise_floor.get("spread") or 0
    ) <= 0.8
    regressions = {}
    for name, med in {**timings, **h_timings}.items():
        base = prior.get(name)
        mn = all_mins.get(name, med)
        if base and mn > REGRESSION_FACTOR * base:
            regressions[name] = {
                "median": med,
                "min": mn,
                "best_prior_normalized": round(base, 3),
                "best_prior_raw": prior_raw.get(name),
                "ratio": round(mn / base, 2),
            }
            print(
                f"REGRESSION {name}: min {mn}s > {REGRESSION_FACTOR}x "
                f"machine-normalized best prior {base:.3f}s "
                f"(raw {prior_raw.get(name)}s, median {med}s)",
                file=sys.stderr,
            )

    # Self-adjudication (r10 VERDICT item 5; un-gated r13 per judge r12
    # item 2): flags used to be re-measured only when the floor was
    # bursty, but r12 proved a stable 0.3 s scheduler-bound floor does
    # NOT certify the heavy phase ran on a quiet host — driver and judge
    # both had floor_stable:true AND 9-flag storms on provably untouched
    # code, with near-disjoint flag sets. A storm is a host signature,
    # not a code one, and the one instrument that can tell them apart is
    # the fresh solo child JVM. So: whenever ANY flag exists, stop THIS
    # JVM (the child runs solo) and re-time the flagged queries there —
    # ~1 min of child time buys a pre-adjudicated verdict on every flag.
    if regressions:
        print(
            f"{len(regressions)} flagged "
            f"(floor_stable={floor_stable}, "
            f"spread {noise_floor.get('spread')}); "
            "re-measuring flagged queries in a fresh solo JVM...",
            file=sys.stderr,
        )
        spark.stop()
        adjudicate_flags(regressions, here)
        for name, entry in regressions.items():
            print(
                f"  {name}: remeasured min {entry.get('remeasured')}s "
                f"-> {entry.get('verdict')}",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": mins,
        "queries_stddev": stddevs,
        "min_total": round(sum(mins.values()), 3),
        "cold_total": round(sum(cold.values()), 3),
        "warm_passes": WARM_PASSES,
        # heavy set reported separately: `value` stays comparable
        # to r1's 28-query contract while the real cost centers
        # get their own attributable series (and feed the same
        # regression gate via best_prior_per_query's union scan)
        "heavy_total": round(sum(h_timings.values()), 3),
        "heavy_queries": h_timings,
        "heavy_queries_min": h_mins,
        "heavy_queries_stddev": h_stddevs,
        "heavy_min_total": round(sum(h_mins.values()), 3),
        "heavy_cold_total": round(sum(h_cold.values()), 3),
        "heavy_warm_passes": HEAVY_WARM_PASSES,
        "cpus": DEFAULT_CPUS,
        "regressions": regressions,
        # False = the floor was bursty across the window; treat
        # any flags above as host noise until a stable-floor
        # run reproduces them
        "floor_stable": floor_stable,
        "noise_floor": noise_floor,
        "compute_floor": compute_floor,
        "sf": sf_num,
    }
    # Full record (the mins/stddev/heavy/regressions/floors maps) goes to
    # a SIDE FILE, not stdout: the round artifact keeps only the last
    # 2000 chars of stdout, and r13's ~6 KB single line truncated past
    # recovery — the whole r13->r14 round-over-round comparison was lost
    # to it (judge r14 #2). The builder commits this file as
    # bench_r{N}_local.json, which best_prior_per_query already reads.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_full_last.json"),
    )
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1)
        print(f"full record -> {full_path}", file=sys.stderr)
    except OSError as e:  # read-only checkout: stdout line still stands
        print(f"full record write failed: {e!r}", file=sys.stderr)
    print(compact_line(full))


if __name__ == "__main__":
    main()
