"""Layout ops: z-key arithmetic vs a pure-Python reimplementation,
two-dimensional data-skipping evidence from real parquet min-max
stats, and compaction binning/rewrite."""

import os
import random

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from context_aware_rag_spark.operators import layout


def _py_zkey(vals, los, his, bits):
    n = len(vals)
    z = 0
    for i, (x, lo, hi) in enumerate(zip(vals, los, his)):
        cell = (x - lo) * (2**bits) // (hi - lo + 1)
        for j in range(bits):
            z |= ((cell >> j) & 1) << (j * n + i)
    return z


class TestZorderKey:
    def test_matches_python(self, spark):
        rnd = random.Random(11)
        rows = [(rnd.randrange(-50, 10_000), rnd.randrange(0, 997)) for _ in range(300)]
        df = spark.createDataFrame(rows, "a: long, b: long")
        got = {
            (r.a, r.b): r.zkey
            for r in layout.add_zorder_key(df, ["a", "b"], bits=8).collect()
        }
        los = (min(r[0] for r in rows), min(r[1] for r in rows))
        his = (max(r[0] for r in rows), max(r[1] for r in rows))
        for a, b in rows:
            assert got[(a, b)] == _py_zkey((a, b), los, his, 8)

    def test_null_key_column_gives_null_key(self, spark):
        df = spark.createDataFrame([(1, 2), (None, 3)], "a: long, b: long")
        rows = {r.a: r.zkey for r in layout.add_zorder_key(df, ["a", "b"], bits=4).collect()}
        assert rows[None] is None and rows[1] is not None

    def test_validates(self, spark):
        df = spark.createDataFrame([(1, 2)], "a: long, b: long")
        with pytest.raises(ValueError, match="bits"):
            layout.add_zorder_key(df, ["a", "b"], bits=32)  # 64 > 63
        with pytest.raises(ValueError, match="column"):
            layout.add_zorder_key(df, [], bits=4)
        with pytest.raises(ValueError, match="exists"):
            layout.add_zorder_key(df, ["a"], bits=4, key_name="b")


class TestDataSkipping:
    def _file_minmax(self, path, cols):
        """Per data file: {col: (min, max)} from parquet row-group stats."""
        out = {}
        for name in os.listdir(path):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, name)).metadata
            stats = {c: [None, None] for c in cols}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    cname = col.path_in_schema
                    if cname in stats and col.statistics is not None:
                        s = col.statistics
                        lo, hi = stats[cname]
                        stats[cname][0] = s.min if lo is None else min(lo, s.min)
                        stats[cname][1] = s.max if hi is None else max(hi, s.max)
            out[name] = {c: tuple(v) for c, v in stats.items()}
        return out

    @staticmethod
    def _matching(files, col, lo, hi):
        return sum(
            1 for st in files.values() if st[col][0] <= hi and st[col][1] >= lo
        )

    def test_zorder_skips_on_both_dims(self, spark, tmp_path):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        n_files = 16
        linear = str(tmp_path / "linear")
        zdir = str(tmp_path / "zorder")
        (
            li.repartitionByRange(n_files, "l_orderkey")
            .sortWithinPartitions("l_orderkey")
            .write.parquet(linear)
        )
        layout.repartition_zorder(
            li, ["l_orderkey", "l_partkey"], n_files, bits=12
        ).write.parquet(zdir)

        cols = ["l_orderkey", "l_partkey"]
        lin = self._file_minmax(linear, cols)
        zrd = self._file_minmax(zdir, cols)
        assert len(lin) == n_files and len(zrd) == n_files

        bounds = li.agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_orderkey"), F.max("l_orderkey"),
        ).collect()[0]
        pk_lo, pk_hi, ok_lo, ok_hi = bounds
        # 8 probe windows of 1/16th width per dimension (range-quantile
        # file boundaries straddle z-cells, so single probes are noisy
        # — the SUM over a probe grid is the stable skipping metric;
        # measured: partkey z=49 lin=128, orderkey z=54 lin=15 of 128)
        def probe_sum(files, col, lo, hi):
            span = (hi - lo) // 16
            return sum(
                self._matching(files, col, lo + k * (hi - lo) // 8,
                               lo + k * (hi - lo) // 8 + span)
                for k in range(8)
            )

        total = 8 * n_files
        # partkey-only predicates: the orderkey-sorted layout can never
        # skip; z-order must skip >= 40% of file reads
        assert probe_sum(lin, "l_partkey", pk_lo, pk_hi) == total
        assert probe_sum(zrd, "l_partkey", pk_lo, pk_hi) <= int(total * 0.6)
        # and z-order still skips on orderkey as well (a linear second
        # sort key would not give this)
        assert probe_sum(zrd, "l_orderkey", ok_lo, ok_hi) <= int(total * 0.6)

    def test_rows_preserved(self, spark, tmp_path):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        out = str(tmp_path / "z")
        layout.repartition_zorder(li, ["l_orderkey", "l_partkey"], 4).write.parquet(out)
        back = spark.read.parquet(out)
        assert back.count() == li.count()
        assert sorted(back.columns) == sorted(li.columns)


class TestCompaction:
    def test_plan_first_fit_decreasing(self, spark, tmp_path):
        src = str(tmp_path / "many")
        spark.range(0, 4000).withColumn("pad", F.md5(F.col("id").cast("string"))) \
            .repartition(8).write.parquet(src)
        sizes = layout.file_stats(spark, src)
        assert len(sizes) == 8
        total = sum(s for _, s in sizes)
        plan = layout.compaction_plan(spark, src, target_bytes=total // 2 + 1)
        assert sorted(f for b in plan for f in b) == sorted(n for n, _ in sizes)
        assert len(plan) <= 3  # ~half-total bins
        # oversized target → one bin
        assert len(layout.compaction_plan(spark, src, target_bytes=total * 2)) == 1

    def test_compact_files_roundtrip(self, spark, tmp_path):
        src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
        spark.range(0, 3200).repartition(32).write.parquet(src)
        n = layout.compact_files(spark, src, dst, target_rows_per_file=1000)
        assert n == 4
        data_files = [
            f for f in os.listdir(dst) if f.endswith(".parquet")
        ]
        assert len(data_files) == 4
        assert spark.read.parquet(dst).count() == 3200

    def test_missing_path_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            layout.file_stats(spark, str(tmp_path / "nope"))


class TestZorderPrecisionEdge:
    def test_integer_division_at_double_edge(self, spark):
        # lo=0, hi=2^54, bits=8 is inside the documented contract
        # ((hi-lo+1)*2^bits < 2^63) but past double precision: a float
        # quotient for x=hi rounds up to exactly 2^bits and leaks a
        # bit outside the interleave width
        hi = 1 << 54
        df = spark.createDataFrame(
            [(0, 0), (hi, 1)], "a: long, b: long"
        )
        got = {
            r.a: r.zkey
            for r in layout.add_zorder_key(df, ["a", "b"], bits=8).collect()
        }
        los, his = (0, 0), (hi, 1)
        for a, b in ((0, 0), (hi, 1)):
            assert got[a] == _py_zkey((a, b), los, his, 8)
        # the max-value row's cell stays below 2^bits: zkey < 2^(2*bits)
        assert all(0 <= z < 1 << 16 for z in got.values())
