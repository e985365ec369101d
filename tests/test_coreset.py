"""k-center greedy coreset: farthest-point semantics, determinism."""

from __future__ import annotations

import math

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.coreset import (
    kcenter_greedy,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKCenterGreedy:
    def test_farthest_point_on_a_line(self, spark):
        # points at x = 0, 1, 10, 11: seed = id0 (x=0); farthest = x=11;
        # then x=10's nearest center is 1 away vs x=1's 1 away -> tie on
        # distance (1.0 each)? no: after centers {0, 11}, mind(1)=1,
        # mind(10)=1 -> tie broken by vec_id -> picks id1 (x=1).
        rows = [(0, [0.0]), (1, [1.0]), (2, [10.0]), (3, [11.0])]
        out = kcenter_greedy(_df(spark, rows), "embedding", "vec_id", 3).collect()
        sel = [(r.sel_order, r.vec_id) for r in sorted(out, key=lambda r: r.sel_order)]
        assert sel == [(1, 0), (2, 3), (3, 1)]
        d = {r.sel_order: r.dist for r in out}
        assert d[1] is None
        assert d[2] == pytest.approx(11.0)
        assert d[3] == pytest.approx(1.0)

    def test_python_reference_parity(self, spark):
        # deterministic pseudo-random points, compare against a plain
        # python greedy with identical tie-breaks
        pts = [
            (i, [((i * 37 + j * 101) % 17) / 4.0 for j in range(5)])
            for i in range(40)
        ]
        k = 5
        out = kcenter_greedy(_df(spark, pts), "embedding", "vec_id", k).collect()
        got = [r.vec_id for r in sorted(out, key=lambda r: r.sel_order)]

        def l2sq(a, b):
            return sum((x - y) ** 2 for x, y in zip(a, b))

        centers = [0]
        mind = {i: l2sq(v, pts[0][1]) for i, v in pts}
        for _ in range(k - 1):
            nxt = max(((m, -i) for i, m in mind.items() if i not in centers))
            pick = -nxt[1]
            centers.append(pick)
            for i, v in pts:
                mind[i] = min(mind[i], l2sq(v, pts[pick][1]))
        assert got == centers

    def test_covering_radius_shrinks_monotonically(self, spark):
        pts = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(30)]
        out = kcenter_greedy(_df(spark, pts), "embedding", "vec_id", 6).collect()
        dists = [r.dist for r in sorted(out, key=lambda r: r.sel_order)][1:]
        assert all(
            dists[i] >= dists[i + 1] or math.isclose(dists[i], dists[i + 1])
            for i in range(len(dists) - 1)
        )

    def test_k_one_returns_seed_only(self, spark):
        out = kcenter_greedy(
            _df(spark, [(5, [1.0]), (2, [9.0])]), "embedding", "vec_id", 1
        ).collect()
        assert len(out) == 1 and out[0].vec_id == 2 and out[0].dist is None

    def test_rejects_bad_k(self, spark):
        with pytest.raises(ValueError):
            kcenter_greedy(_df(spark, [(1, [0.0])]), "embedding", "vec_id", 0)
