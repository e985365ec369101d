"""Supervised categorical encoding: LOO target encoding and WOE/IV."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.encoding import (
    target_encode_loo,
    woe_iv,
)


class TestTargetEncodeLOO:
    def test_excludes_own_label(self, spark):
        # group 'a': y = [1, 0, 1] -> LOO for the 1-rows = 1/2, for the
        # 0-row = 2/2 = 1.
        df = spark.createDataFrame(
            [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 1), (5, "b", 0)],
            "id long, c string, y long",
        )
        out = {r.id: r.loo_ppm for r in target_encode_loo(df, "c", "y").collect()}
        assert out[1] == 500_000 and out[3] == 500_000
        assert out[2] == 1_000_000
        assert out[4] == 0 and out[5] == 1_000_000

    def test_singleton_group_is_null(self, spark):
        df = spark.createDataFrame([(1, "solo", 1)], "id long, c string, y long")
        assert target_encode_loo(df, "c", "y").collect()[0].loo_ppm is None

    def test_mean_without_self_never_leaks(self, spark):
        # constant-label group: LOO equals the constant — but flipping
        # one row's label must change ONLY the peers' encodings, never
        # its own (its own encoding sees only the others).
        base = [(i, "g", 0) for i in range(10)]
        flipped = [(0, "g", 1)] + base[1:]
        enc_b = {
            r.id: r.loo_ppm
            for r in target_encode_loo(
                spark.createDataFrame(base, "id long, c string, y long"), "c", "y"
            ).collect()
        }
        enc_f = {
            r.id: r.loo_ppm
            for r in target_encode_loo(
                spark.createDataFrame(flipped, "id long, c string, y long"), "c", "y"
            ).collect()
        }
        assert enc_f[0] == enc_b[0] == 0  # own row unchanged
        assert all(enc_f[i] == 1_000_000 // 9 for i in range(1, 10))


class TestWoeIv:
    def _python_reference(self, cells):
        # cells: {bucket: (n_good, n_bad)} raw counts
        g = {b: x + 1 for b, (x, _) in cells.items()}
        bb = {b: x + 1 for b, (_, x) in cells.items()}
        G, B = sum(g.values()), sum(bb.values())
        woe = {
            b: math.floor(math.log((g[b] * B) / (bb[b] * G)) * 1e6 + 0.5)
            for b in cells
        }
        num = sum((g[b] * B - bb[b] * G) * woe[b] for b in cells)
        return woe, num // (G * B)

    def test_matches_python_reference(self, spark):
        cells = {0: (30, 5), 1: (10, 10), 2: (2, 40)}
        rows = [
            (b, 1) for b, (ng, _) in cells.items() for _ in range(ng)
        ] + [(b, 0) for b, (_, nb) in cells.items() for _ in range(nb)]
        df = spark.createDataFrame(rows, "b long, y long")
        out = woe_iv(df, "b", "y").collect()
        woe_ref, iv_ref = self._python_reference(cells)
        for r in out:
            assert r.woe_micro == woe_ref[r.bucket]
            assert r.iv_micro == iv_ref
            assert (r.n_good, r.n_bad) == cells[r.bucket]

    def test_uninformative_feature_has_zero_iv(self, spark):
        # identical good/bad composition in every bucket -> WOE = 0
        rows = [(b, y) for b in range(4) for y in (0, 1) for _ in range(7)]
        df = spark.createDataFrame(rows, "b long, y long")
        out = woe_iv(df, "b", "y").collect()
        assert all(r.woe_micro == 0 and r.iv_micro == 0 for r in out)

    def test_empty_cell_survives_smoothing(self, spark):
        # a bucket with zero bad rows must stay finite via Laplace +1
        rows = [(0, 1)] * 5 + [(1, 0)] * 5
        df = spark.createDataFrame(rows, "b long, y long")
        out = {r.bucket: r for r in woe_iv(df, "b", "y").collect()}
        assert out[0].woe_micro > 0 > out[1].woe_micro
        assert out[0].iv_micro > 0


class TestRegisteredEntries:
    @pytest.mark.parametrize("name", ["ml_target_encode_loo", "ml_woe_iv_doclen"])
    def test_smoke(self, spark, sf_dir, name):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
            REGISTRY,
        )

        fn, sql = REGISTRY[name]
        rows = fn(spark, sf_dir).collect()
        assert sql is not None and len(rows) >= 1
        if name == "ml_woe_iv_doclen":
            assert len({r.iv_micro for r in rows}) == 1
            assert all(r.iv_micro >= 0 for r in rows)
