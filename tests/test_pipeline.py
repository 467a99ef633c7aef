"""Unit tests for the round-5 pipeline operators: winnowing, BFS
min-hops, BMP decode, and the BPE merge-counting formula.

The corpus sweep (test_corpus_sweep.py) already oracle-checks the full
queries end-to-end; these tests pin the SEMANTIC guarantees on crafted
inputs the synthetic corpus can't be relied on to contain — the
winnowing match guarantee, BFS hop minimality on a known graph, signed/
truncated/garbage BMP payloads, and the greedy non-overlap merge count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ------------------------------------------------------------ winnowing


class TestWinnowing:
    K, W = 5, 4

    def _fps(self, spark, docs):
        from es_to_clickhouse_spark.operators.text import winnowing_fingerprints

        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = winnowing_fingerprints(df, "doc_id", "text", self.K, self.W).collect()
        out: dict[int, set[str]] = {}
        for r in rows:
            # strip the 6-char position suffix: the fingerprint identity
            # is the gram hash; the suffix only orders ties inside a window
            out.setdefault(r.doc_id, set()).add(r.fp[:-6])
        return out

    def test_match_guarantee(self, spark):
        """Any shared substring of length >= w + k - 1 (= 8) must yield a
        shared fingerprint — the winnowing paper's core guarantee."""
        shared = "QWERTYUIOPAS"  # 12 chars >> 8
        fps = self._fps(
            spark,
            [(1, "aaaa" + shared + "bbbb"), (2, "cccccc" + shared + "dd")],
        )
        assert fps[1] & fps[2], "no shared fingerprint for a 12-char match"

    def test_disjoint_texts_share_nothing(self, spark):
        fps = self._fps(
            spark, [(1, "abcdefghijklmnop"), (2, "ABCDEFGHIJKLMNOP")]
        )
        assert not (fps[1] & fps[2])

    def test_short_doc_yields_no_rows(self, spark):
        from es_to_clickhouse_spark.operators.text import winnowing_fingerprints

        df = spark.createDataFrame([(1, "abcdefg")], "doc_id long, text string")
        assert winnowing_fingerprints(df, "doc_id", "text", self.K, self.W).count() == 0

    def test_density(self, spark):
        """Selected fraction ~2/(w+1) of grams: far fewer fingerprints
        than windows, but at least n_windows / w (one per w windows)."""
        import random

        rng = random.Random(7)
        text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(400))
        from es_to_clickhouse_spark.operators.text import winnowing_fingerprints

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = winnowing_fingerprints(df, "doc_id", "text", self.K, self.W).collect()
        n_windows = len(rows)
        n_fp = len({r.fp for r in rows})
        assert n_windows == 400 - (self.K - 1) - (self.W - 1)
        assert n_windows / self.W <= n_fp <= n_windows / 2 + 1


# ----------------------------------------------------------- BFS hops


class TestBfsMinHops:
    def _run(self, spark, edges, seeds, max_hops=3):
        from es_to_clickhouse_spark.operators.graph import bfs_min_hops

        e = spark.createDataFrame(edges, "a long, b long")
        s = spark.createDataFrame([(x,) for x in seeds], "node long")
        return {
            r.node: r.hop for r in bfs_min_hops(e, s, max_hops=max_hops).collect()
        }

    def test_chain_hops_and_bound(self, spark):
        # 1 -> 2 -> 3 -> 4 -> 5: node 5 is 4 hops out, beyond max_hops=3
        got = self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1])
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_min_hop_wins_over_longer_path(self, spark):
        # 1->2->3 and a direct 1->3: node 3 must be hop 1, not 2
        got = self._run(spark, [(1, 2), (2, 3), (1, 3)], [1])
        assert got[3] == 1

    def test_multiple_seeds_and_cycle(self, spark):
        # cycle 1->2->1 must terminate; seed set {1, 10}
        got = self._run(spark, [(1, 2), (2, 1), (10, 11)], [1, 10])
        assert got == {1: 0, 10: 0, 2: 1, 11: 1}

    def test_isolated_seed(self, spark):
        got = self._run(spark, [(5, 6)], [99])
        assert got == {99: 0}


# ----------------------------------------------------------- BMP decode


class TestBmpDims:
    def _decode(self, spark, hexes):
        from es_to_clickhouse_spark.operators.multimodal import bmp_dims

        df = spark.createDataFrame([(i, h) for i, h in enumerate(hexes)], "i long, hx string")
        w, h, bpp = bmp_dims(F.unhex(F.col("hx")))
        return [
            (r.w, r.h, r.bpp)
            for r in df.orderBy("i")
            .select(w.alias("w"), h.alias("h"), bpp.alias("bpp"))
            .collect()
        ]

    @staticmethod
    def _bmp(width: int, height: int, bpp: int) -> str:
        import struct

        b = b"BM" + b"\x00" * 8 + struct.pack("<IIii", 54, 40, width, height)
        b += struct.pack("<HH", 1, bpp)
        return b.hex()

    def test_positive_dims(self, spark):
        assert self._decode(spark, [self._bmp(640, 480, 24)]) == [(640, 480, 24)]

    def test_negative_height_top_down(self, spark):
        assert self._decode(spark, [self._bmp(1920, -1080, 32)]) == [(1920, -1080, 32)]

    def test_wrong_magic_fails_closed(self, spark):
        png = "89504e470d0a1a0a" + "00" * 22
        assert self._decode(spark, [png]) == [(None, None, None)]

    def test_int32_sign_boundary(self, spark):
        # 0x7FFFFFFF stays positive; 0x80000000 wraps to -2^31
        assert self._decode(
            spark, [self._bmp(2**31 - 1, -(2**31), 1)]
        ) == [(2**31 - 1, -(2**31), 1)]


# ------------------------------------------------------ BPE merge count


class TestBpeMergeCount:
    def test_greedy_nonoverlap_semantics(self, spark):
        """(len - len(replace(w, pair, ''))) / 2 must equal the greedy
        left-to-right non-overlapping count a BPE merge pass performs —
        including the 'aaa' overlap trap (ONE merge, not two)."""
        cases = [
            ("banana", "an", 2),
            ("aaa", "aa", 1),
            ("aaaa", "aa", 2),
            ("abab", "ab", 2),
            ("xyz", "ab", 0),
        ]
        df = spark.createDataFrame(cases, "w string, pair string, want long")
        got = df.select(
            "want",
            ((F.length("w") - F.length(F.replace(F.col("w"), F.col("pair")))) / 2)
            .cast("long")
            .alias("got"),
        ).collect()
        for r in got:
            assert r.got == r.want


# ------------------------------------------------------ window funnel


class TestWindowFunnel:
    def _run(self, spark, tmp_path, rows):
        """rows: (event_id, us, user_id, event_type)."""
        import datetime as dt

        from es_to_clickhouse_spark.corpus.behavior import b6_window_funnel

        data = [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(microseconds=us), uid, et)
            for eid, us, uid, et in rows
        ]
        df = spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id long, event_type string"
        )
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = b6_window_funnel(spark, str(tmp_path))
        return {r.user_id: r.funnel_level for r in out.collect()}

    H = 3_600_000_000  # 1h in us; funnel window is 6h

    def test_sliding_anchor_beats_first_view(self, spark, tmp_path):
        """The chain may start at ANY view: the first view's window is
        blown (purchase at +8h) but a later view opens a fresh 6h window
        that fits a full chain — windowFunnel semantics, NOT w12's
        first-anchor funnel."""
        rows = [
            (1, 0 * self.H, 1, "view"),
            (2, 1 * self.H, 1, "click"),
            (3, 5 * self.H, 1, "view"),   # fresh anchor
            (4, 6 * self.H, 1, "click"),
            (5, 8 * self.H, 1, "purchase"),  # 8h > 0+6h, but <= 5h+6h
        ]
        assert self._run(spark, tmp_path, rows)[1] == 3

    def test_window_bound_cuts_chain(self, spark, tmp_path):
        rows = [
            (1, 0, 1, "view"),
            (2, 1 * self.H, 1, "click"),
            (3, 8 * self.H, 1, "purchase"),  # outside every view's window
        ]
        assert self._run(spark, tmp_path, rows)[1] == 2

    def test_order_matters(self, spark, tmp_path):
        # purchase BEFORE the click: no depth-3 chain
        rows = [
            (1, 0, 1, "view"),
            (2, 1 * self.H, 1, "purchase"),
            (3, 2 * self.H, 1, "click"),
            (4, 0, 2, "click"),  # user 2: click with no prior view
            (5, 1 * self.H, 2, "signup"),
        ]
        got = self._run(spark, tmp_path, rows)
        assert got[1] == 2
        assert got[2] == 0

    def test_intermediate_click_must_follow_anchor_view(self, spark, tmp_path):
        """A click BEFORE the only in-window view cannot serve the chain:
        view@7h is within 6h of purchase@8h, but the only click (@1h)
        precedes it — depth stays 2 (view→click from the 0h anchor)."""
        rows = [
            (1, 0, 1, "view"),
            (2, 1 * self.H, 1, "click"),
            (3, 7 * self.H, 1, "view"),
            (4, 8 * self.H, 1, "purchase"),
        ]
        assert self._run(spark, tmp_path, rows)[1] == 2


# --------------------------------------------------------- z-order


class TestZorder:
    def test_interleave_matches_reference(self, spark):
        """zorder_value == the textbook Morton interleave for random
        8-bit pairs (first column owns the higher bit of each pair)."""
        import random

        from es_to_clickhouse_spark.operators.partitioning import zorder_value

        rng = random.Random(11)
        pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(200)]

        def ref(u, t):
            z = 0
            for i in range(8):
                z |= ((u >> i) & 1) << (2 * i + 1)
                z |= ((t >> i) & 1) << (2 * i)
            return z

        df = spark.createDataFrame(pts, "u long, t long")
        got = df.select(
            "u", "t", zorder_value([F.col("u"), F.col("t")], 8).alias("z")
        ).collect()
        for r in got:
            assert r.z == ref(r.u, r.t), (r.u, r.t)

    def test_bucket_locality(self, spark):
        """Fixing the top 6 z-bits (bucket = z >> 10) pins the top 3 bits
        of EACH dim: every bucket spans <= 32 scaled units per dimension —
        the min/max-stat prunability the layout exists for."""
        from es_to_clickhouse_spark.operators.partitioning import zorder_value

        pts = [(u, t) for u in range(0, 256, 7) for t in range(0, 256, 5)]
        df = spark.createDataFrame(pts, "u long, t long")
        rows = (
            df.select("u", "t", zorder_value([F.col("u"), F.col("t")], 8).alias("z"))
            .groupBy(F.shiftright("z", 10).alias("b"))
            .agg(
                (F.max("u") - F.min("u")).alias("du"),
                (F.max("t") - F.min("t")).alias("dt"),
            )
            .collect()
        )
        assert rows
        for r in rows:
            assert r.du <= 31 and r.dt <= 31

    def test_scale_to_bits_bounds(self, spark):
        from es_to_clickhouse_spark.operators.partitioning import scale_to_bits

        df = spark.createDataFrame(
            [(x,) for x in (-50, -1, 0, 1, 99, 100)], "v long"
        )
        got = df.select(
            scale_to_bits(F.col("v"), F.lit(-50), F.lit(100), 8).alias("s")
        ).collect()
        vals = [r.s for r in got]
        assert min(vals) == 0 and max(vals) == 255 or max(vals) <= 255
        assert vals == sorted(vals)
        assert all(0 <= v <= 255 for v in vals)

    def test_scale_to_bits_exact_past_double_precision(self, spark):
        """(v - min) * 2^bits beyond 2^53 (epoch-micros spans over ~1
        year at bits=8): floor(double) can be off by one vs true integer
        division; the correction step must restore exact floor-div
        (ADVICE r5). Checked against Python's exact big-int // ."""
        from es_to_clickhouse_spark.operators.partitioning import scale_to_bits
        lo, hi = 0, 3 * 10**13  # ~1 year of micros -> num up to 7.7e15 > 2^53
        span = hi - lo + 1
        # probe values straddling bucket boundaries where the double
        # quotient is most likely to land on the wrong side
        probes = []
        for b in (1, 127, 128, 200, 255):
            edge = b * span // 256
            probes += [edge - 1, edge, edge + 1]
        probes = [min(max(v, lo), hi) for v in probes]
        df = spark.createDataFrame([(v,) for v in probes], "v long")
        got = [
            r.s
            for r in df.select(
                scale_to_bits(F.col("v"), F.lit(lo), F.lit(hi), 8).alias("s")
            ).collect()
        ]
        want = [(v - lo) * 256 // span for v in probes]
        assert got == want


# ------------------------------------------------------ interval merge


class TestMergeIntervals:
    def _run(self, spark, ivals):
        from es_to_clickhouse_spark.operators.ordered import merge_intervals

        df = spark.createDataFrame(ivals, "k long, s long, e long")
        return sorted(
            (r.k, r.s, r.e, r.n_members)
            for r in merge_intervals(df, ["k"], "s", "e").collect()
        )

    def test_overlap_touch_gap_nested(self, spark):
        got = self._run(
            spark,
            [
                (1, 0, 10), (1, 5, 15),    # overlap -> [0, 15)
                (1, 15, 20),               # touching (end == start) merges
                (1, 30, 40), (1, 32, 35),  # nested -> [30, 40)
                (1, 50, 60),               # isolated
                (2, 0, 5),                 # other key untouched
            ],
        )
        assert got == [
            (1, 0, 20, 3),
            (1, 30, 40, 2),
            (1, 50, 60, 1),
            (2, 0, 5, 1),
        ]

    def test_chain_through_running_max(self, spark):
        """A short interval must not close the island while an earlier
        long one still spans it: [0,100) [5,10) [50,60) [90,110) is ONE
        island — the running max (not the previous row's end) decides."""
        got = self._run(
            spark, [(1, 0, 100), (1, 5, 10), (1, 50, 60), (1, 90, 110)]
        )
        assert got == [(1, 0, 110, 4)]


# ------------------------------------------- z-order file skipping


class TestZorderFileSkipping:
    def test_zorder_layout_prunes_both_dims(self, spark, tmp_path):
        """The claim zo1 exists for: range-partitioning by the z-value
        makes parquet file-level min/max stats selective on BOTH
        dimensions, where a single-dim sort is selective on one only.
        Measured directly from the written footers: candidate files for
        a narrow predicate on the NON-leading dim must shrink by >= 2x
        vs the time-sorted layout (and the leading dim stays prunable).
        """
        import pyarrow.parquet as pq
        import glob
        import random

        from es_to_clickhouse_spark.operators.partitioning import (
            scale_to_bits,
            zorder_value,
        )

        rng = random.Random(3)
        rows = [(rng.randrange(1024), rng.randrange(1024)) for _ in range(40_000)]
        df = spark.createDataFrame(rows, "u long, t long")

        def write(d, path, n=32):
            d.repartitionByRange(n, "sort_key").drop("sort_key").write.parquet(path)

        # layout A: sorted by time only
        write(df.withColumn("sort_key", F.col("t")), f"{tmp_path}/bytime")
        # layout B: z-ordered on (u, t)
        z = df.select(
            "u",
            "t",
            zorder_value(
                [
                    scale_to_bits(F.col("u"), F.lit(0), F.lit(1023), 8),
                    scale_to_bits(F.col("t"), F.lit(0), F.lit(1023), 8),
                ],
                8,
            ).alias("sort_key"),
        )
        write(z, f"{tmp_path}/byz")

        def candidates(path, col, lo, hi):
            """Files whose footer [min, max] for col intersects [lo, hi]."""
            n_all, n_hit = 0, 0
            for f in glob.glob(f"{path}/part-*.parquet"):
                md = pq.ParquetFile(f).metadata
                ci = next(
                    j
                    for j in range(md.num_columns)
                    if md.schema.column(j).name == col
                )
                stats = [
                    md.row_group(i).column(ci).statistics
                    for i in range(md.num_row_groups)
                ]
                fmin = min(s.min for s in stats)
                fmax = max(s.max for s in stats)
                n_all += 1
                if fmax >= lo and fmin <= hi:
                    n_hit += 1
            return n_all, n_hit

        # narrow u-range predicate (the non-leading dim for layout A)
        all_a, hit_a = candidates(f"{tmp_path}/bytime", "u", 100, 163)
        all_b, hit_b = candidates(f"{tmp_path}/byz", "u", 100, 163)
        assert all_a >= 16 and all_b >= 16
        assert hit_a == all_a  # time-sorted layout cannot prune on u
        assert hit_b * 2 <= all_b  # z-order prunes u by >= 2x
        # t stays prunable under z-order too (both dims benefit)
        _, t_hit_b = candidates(f"{tmp_path}/byz", "t", 100, 163)
        assert t_hit_b * 2 <= all_b


# ------------------------------------------- generic n-level funnel


class TestGenericWindowFunnel:
    def test_four_level_cascade(self, spark):
        """window_funnel with 4 conditions: depth counts only in-order
        in-window chains; a level-4 chain must trace back through ALL
        three prefix stages (s3 -> s2 -> s1), not just any d event."""
        from es_to_clickhouse_spark.operators.funnel import window_funnel

        rows = [
            # user 1: a(0) b(10) c(20) d(30), window 100 -> level 4
            (1, 0, 1, "a"), (2, 10, 1, "b"), (3, 20, 1, "c"), (4, 30, 1, "d"),
            # user 2: d arrives BEFORE c — a<b<c holds (level 3) but no
            # d after the c, so never level 4
            (5, 0, 2, "a"), (6, 10, 2, "b"), (7, 20, 2, "d"), (8, 30, 2, "c"),
            # user 3: full chain but final d outside the window of every a
            (9, 0, 3, "a"), (10, 10, 3, "b"), (11, 20, 3, "c"), (12, 500, 3, "d"),
            # user 4: no a at all
            (13, 0, 4, "b"), (14, 10, 4, "c"), (15, 20, 4, "d"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, us long, user_id long, et string"
        )
        got = {
            r.user_id: r.funnel_level
            for r in window_funnel(
                df,
                key_col="user_id",
                ts_col="us",
                order_cols=["event_id"],
                conds=[F.col("et") == c for c in ("a", "b", "c", "d")],
                window=100,
            ).collect()
        }
        assert got == {1: 4, 2: 3, 3: 3, 4: 0}
