"""Round-11 query entries vs independent python references at sf0.001:
Kendall tau-b (O(n^2) pair definition), 2D skyline (brute-force
dominance), isotonic calibration (minimax identity), split-conformal
(direct recompute).  The DuckDB oracle gate covers cross-engine
equality; these pin the SEMANTICS against the textbook definitions
with derivations that share no code with the engine."""

from __future__ import annotations

from fractions import Fraction

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    REGISTRY,
)

SF = "/root/testdata/sf0.001"


def _per_customer(spark):
    import pyspark.sql.functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    return [
        (int(r["nord"]), int(r["spend"]))
        for r in orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("nord"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
                "spend"
            ),
        )
        .collect()
    ]


class TestKendallTau:
    def test_pair_definition_parity(self, spark):
        pts = _per_customer(spark)
        n = len(pts)
        conc = disc = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
                if dx == 0:
                    tx += 1
                if dy == 0:
                    ty += 1
        row = REGISTRY["stats_kendall_tau"][0](spark, SF).collect()[0]
        assert row["n_customers"] == n
        assert row["n_conc"] == conc
        assert row["n_disc"] == disc
        n0 = n * (n - 1) // 2
        import math

        tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
        assert row["kendall_tau4"] == pytest.approx(round(tau, 4), abs=1e-9)


class TestSkyline:
    def test_bruteforce_dominance_parity(self, spark):
        import pyspark.sql.functions as F

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        per = {
            int(r["o_custkey"]): (int(r["sp"]), int(r["rec"]))
            for r in orders.groupBy("o_custkey")
            .agg(
                F.floor(F.sum("o_totalprice") * 100 + 0.5).cast("long").alias("sp"),
                F.datediff(F.max("o_orderdate"), F.lit("1970-01-01")).alias("rec"),
            )
            .collect()
        }

        def dominated(c):
            s, r = per[c]
            return any(
                (s2 >= s and r2 >= r and (s2 > s or r2 > r))
                for c2, (s2, r2) in per.items()
                if c2 != c
            )

        expect = sorted(c for c in per if not dominated(c))
        got = sorted(
            r["o_custkey"]
            for r in REGISTRY["customer_skyline_spend_recency"][0](spark, SF).collect()
        )
        assert got == expect
        assert len(got) >= 1


class TestIsotonic:
    def test_minimax_identity_parity(self, spark):
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        trusted = ("src0", "src1", "src2", "src3", "src4")
        per = sorted(
            (int(r["s"]), int(r["n"]), int(r["pos"]))
            for r in docs.groupBy(F.col("n_chars").alias("s"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("source").isin(*trusted).cast("long")).alias("pos"),
            )
            .collect()
        )
        D = len(per)
        # minimax: fit_i = max_{j<=i} min_{k>=i} avg(pos[j..k] / n[j..k])
        expect = {}
        for i in range(D):
            best = None
            for j in range(i + 1):
                worst = None
                num = den = 0
                # min over k >= i of the average starting at j
                num = sum(p for _s, _n, p in per[j : i + 1])
                den = sum(nn for _s, nn, _p in per[j : i + 1])
                worst = Fraction(num, den)
                for k in range(i + 1, D):
                    num += per[k][2]
                    den += per[k][1]
                    worst = min(worst, Fraction(num, den))
                best = worst if best is None else max(best, worst)
            expect[per[i][0]] = (best.numerator * 1_000_000) // best.denominator
        got = {
            int(r["s"]): int(r["fit_ppm"])
            for r in REGISTRY["eval_isotonic_calibration"][0](spark, SF).collect()
        }
        assert got == expect
        # fitted curve is non-decreasing in s
        vals = [got[s] for s in sorted(got)]
        assert vals == sorted(vals)


class TestConformal:
    def test_direct_recompute_parity(self, spark):
        import hashlib

        docs = spark.read.parquet(f"{SF}/documents.parquet").collect()

        def bucket(doc_id):
            h = hashlib.md5(f"conf§{doc_id}".encode()).hexdigest()[:8]
            return int(h, 16) % 100

        by_src: dict[str, dict[str, list]] = {}
        for r in docs:
            side = "cal" if bucket(r["doc_id"]) < 50 else "test"
            by_src.setdefault(r["source"], {"cal": [], "test": []})[side].append(
                int(r["n_chars"])
            )
        got = {
            r["source"]: r
            for r in REGISTRY["eval_conformal_doclen"][0](spark, SF).collect()
        }
        for src, sides in by_src.items():
            cal, test = sides["cal"], sides["test"]
            if not cal or not test:
                assert src not in got
                continue
            mu = sum(cal) // len(cal)
            k = (9 * len(cal) + 18) // 10
            resid = sorted(abs(x - mu) for x in cal)
            qhat = resid[min(k, len(cal)) - 1]
            hits = sum(1 for x in test if abs(x - mu) <= qhat)
            row = got[src]
            assert row["n_cal"] == len(cal)
            assert row["n_test"] == len(test)
            assert row["qhat"] == qhat
            assert row["coverage_ppm"] == (hits * 1_000_000) // len(test)
