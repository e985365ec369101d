"""Round-13 additions vs independent python references at sf0.001:
water-filling token-budget allocation (exact brute-force water level +
conservation/fairness invariants), prototype-distance PSI (full
integer-exact recompute sharing no code with the engine), the PQ
literal-SQL guards (non-finite codebooks, backticked columns), and the
check_oracle --sample tail draw's reproducibility.  The DuckDB oracle
gate covers cross-engine equality; these pin SEMANTICS."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    REGISTRY,
)

SF = "/root/testdata/sf0.001"


def _run(spark, name: str):
    fn, _ = REGISTRY[name]
    return fn(spark, SF).collect()


class TestWaterfillTokenBudget:
    def _avails(self, spark) -> dict[str, int]:
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        rows = (
            docs.groupBy("source")
            .agg(F.expr("sum((n_chars + 3) div 4)").alias("a"))
            .collect()
        )
        return {r["source"]: int(r["a"]) for r in rows}

    def _brute_waterfill(self, avail: dict[str, int], t: int) -> dict[str, int]:
        """Reference water-filling by direct search over integer levels:
        find the largest level L with sum(min(a, L)) <= t, then hand the
        leftover out one token each in (avail, name) rank order among
        unsaturated sources."""
        if t >= sum(avail.values()):
            return dict(avail)
        lo, hi = 0, max(avail.values())
        while lo < hi:  # largest L with consumed(L) <= t
            mid = (lo + hi + 1) // 2
            if sum(min(a, mid) for a in avail.values()) <= t:
                lo = mid
            else:
                hi = mid - 1
        level = lo
        alloc = {s: min(a, level) for s, a in avail.items()}
        rem = t - sum(alloc.values())
        unsat = sorted(
            (s for s, a in avail.items() if a > level),
            key=lambda s: (avail[s], s),
        )
        for s in unsat[:rem]:
            alloc[s] += 1
        return alloc

    def test_brute_force_parity(self, spark):
        avail = self._avails(spark)
        total = sum(avail.values())
        t = (4 * total) // 10
        expect = self._brute_waterfill(avail, t)
        got = {r["source"]: r["alloc_tokens"] for r in _run(spark, "train_waterfill_token_budget")}
        assert got == expect

    def test_conservation_and_fairness(self, spark):
        rows = _run(spark, "train_waterfill_token_budget")
        avail = {r["source"]: r["avail_tokens"] for r in rows}
        alloc = {r["source"]: r["alloc_tokens"] for r in rows}
        total = sum(avail.values())
        t = (4 * total) // 10
        # budget spent exactly, nobody over-allocated
        assert sum(alloc.values()) == t
        assert all(alloc[s] <= avail[s] for s in avail)
        # saturated flag == kept whole; clipped sources within 1 token
        # of each other (the max-min-fair level +/- remainder token)
        sat = {r["source"]: r["saturated"] for r in rows}
        clipped = [alloc[s] for s in alloc if not sat[s]]
        assert all((alloc[s] == avail[s]) == bool(sat[s]) or alloc[s] == avail[s] for s in avail)
        if clipped:
            assert max(clipped) - min(clipped) <= 1
            # every saturated source is no bigger than any clipped share
            sat_sizes = [avail[s] for s in avail if sat[s]]
            if sat_sizes:
                assert max(sat_sizes) <= max(clipped)

    def test_operator_rejects_bad_fraction(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.groupwise import (
            waterfill_budget,
        )

        df = spark.createDataFrame([("a", 10)], "source string, avail long")
        with pytest.raises(ValueError):
            waterfill_budget(df, budget_num=10, budget_den=10)
        with pytest.raises(ValueError):
            waterfill_budget(df, budget_num=0, budget_den=10)


class TestEmbedPrototypePsi:
    B = 8

    def _ref(self, spark) -> dict[int, tuple[int, int, int]]:
        """Independent recompute: collected embeddings -> prototypes ->
        d2 fold -> bucket -> Laplace PSI, all in plain python."""
        rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        vecs = [(int(r["vec_id"]), int(r["label"]), list(r["embedding"])) for r in rows]

        def is_ref(vid: int) -> bool:
            h = hashlib.md5(f"protopsi§{vid}".encode()).hexdigest()[:8]
            return int(h, 16) % 2 == 0

        by_label: dict[int, list[list[float]]] = defaultdict(list)
        for vid, lab, v in vecs:
            if is_ref(vid):
                by_label[lab].append(v)
        protos = {}
        for lab, vs in by_label.items():
            dim = len(vs[0])
            protos[lab] = [
                round(math.fsum(float(v[i]) for v in vs) / len(vs), 4) + 0.0
                for i in range(dim)
            ]
        # NOTE: engine folds sum(x_i^2) sequentially, not fsum; replicate
        scored = []
        for vid, lab, v in vecs:
            if lab not in protos:
                continue
            acc = 0.0
            p = protos[lab]
            for i in range(len(p)):
                d = float(v[i]) - p[i]
                acc = acc + d * d
            scored.append((lab, is_ref(vid), math.floor(acc * 10000 + 0.5)))
        lo = min(s[2] for s in scored)
        hi = max(s[2] for s in scored)
        counts: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
        for lab, ref, d2q in scored:
            b = ((d2q - lo) * self.B) // (hi - lo + 1)
            counts[(lab, b)][0 if ref else 1] += 1
        out = {}
        for lab in {k[0] for k in counts}:
            n_ref = sum(counts[(lab, b)][0] for b in range(self.B) if (lab, b) in counts)
            n_cur = sum(counts[(lab, b)][1] for b in range(self.B) if (lab, b) in counts)
            na, nb = n_ref + self.B, n_cur + self.B

            def lnm(x: int) -> int:
                return math.floor(math.log(float(x)) * 1000000 + 0.5)

            num = 0
            for b in range(self.B):
                ca, cb = counts.get((lab, b), [0, 0])
                axb = (ca + 1) * nb
                bxa = (cb + 1) * na
                num += (axb - bxa) * (lnm(axb) - lnm(bxa))
            out[lab] = (n_ref, n_cur, num // (na * nb))
        return out

    def test_integer_recompute(self, spark):
        expect = self._ref(spark)
        got = {
            r["label"]: (r["n_ref"], r["n_cur"], r["psi_micro"])
            for r in _run(spark, "embed_prototype_psi")
        }
        assert got == expect

    def test_psi_nonnegative(self, spark):
        assert all(r["psi_micro"] >= 0 for r in _run(spark, "embed_prototype_psi"))


class TestPqLiteralGuards:
    def test_non_finite_codebook_raises(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.pq import (
            pq_encode,
            pq_search,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        bad = [[[0.0, 0.0], [float("inf"), 0.0]], [[0.0, 0.0], [0.0, 0.0]]]
        with pytest.raises(ValueError, match="non-finite"):
            pq_encode(df, bad)
        good = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
        enc = pq_encode(df, good)
        with pytest.raises(ValueError, match="non-finite"):
            pq_search(enc, [float("nan")] * 4, good)

    def test_backtick_column_rejected(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.pq import (
            pq_encode,
        )

        df = spark.createDataFrame(
            [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="backtick"):
            pq_encode(df, [[[0.0, 0.0]]], vec_col="emb`edding")


class TestTailSample:
    def test_draw_is_reproducible_and_from_tail(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "co", "/root/repo/tools/check_oracle.py"
        )
        co = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(co)
        names = list(REGISTRY)
        tail1, snaps1 = co._never_evidenced_tail(names)
        tail2, _ = co._never_evidenced_tail(names)
        assert tail1 == tail2 and len(snaps1) >= 12
        assert set(tail1) <= set(names)
        import random

        a = sorted(random.Random(99).sample(tail1, 10))
        b = sorted(random.Random(99).sample(tail1, 10))
        assert a == b and set(a) <= set(tail1)


class TestGoodTuringMass:
    def test_counts_recompute(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            normalize_whitespace_col,
        )
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        texts = [
            r[0]
            for r in docs.select(normalize_whitespace_col("text")).collect()
        ]
        freq: dict[str, int] = defaultdict(int)
        for t in texts:
            for w in t.strip().split(" "):
                if w:
                    freq[w] += 1
        n_tokens = sum(freq.values())
        v = len(freq)
        n1 = sum(1 for c in freq.values() if c == 1)
        n2 = sum(1 for c in freq.values() if c == 2)
        chao1 = v + (n1 * n1) // (2 * n2) if n2 else v + (n1 * (n1 - 1)) // 2
        (row,) = _run(spark, "vocab_good_turing_mass")
        assert (
            row["n_tokens"], row["vocab_size"], row["n_singletons"],
            row["n_doubletons"], row["unseen_mass_ppm"], row["chao1_richness"],
        ) == (n_tokens, v, n1, n2, (1000000 * n1) // n_tokens, chao1)


class TestCohensKappa:
    def test_confusion_and_kappa_recompute(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
        trusted = {"src0", "src1", "src2", "src3", "src4"}
        n = len(docs)
        s = sum(int(r["n_chars"]) for r in docs)
        tp = fp = fn = tn = 0
        for r in docs:
            p = int(r["n_chars"]) * n > s
            y = r["source"] in trusted
            if p and y:
                tp += 1
            elif p:
                fp += 1
            elif y:
                fn += 1
            else:
                tn += 1
        a, b = tp + tn, (tp + fn) * (tp + fp) + (fp + tn) * (fn + tn)
        num, den = 1000000 * (a * n - b), n * n - b

        def tdiv(x: int, y: int) -> int:  # truncation toward zero
            q = abs(x) // abs(y)
            return q if (x >= 0) == (y > 0) else -q

        kappa = 1000000 if den == 0 else tdiv(num, den)
        (row,) = _run(spark, "eval_cohens_kappa_doclen")
        assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
        assert row["po_ppm"] == (1000000 * a) // n
        assert row["pe_ppm"] == (1000000 * b) // (n * n)
        assert row["kappa_ppm"] == kappa
        # kappa <= po always; kappa in [-1e6, 1e6]
        assert -1000000 <= row["kappa_ppm"] <= 1000000


def _protos_ref(spark):
    """Reference prototypes: per-label 4dp-rounded mean embeddings."""
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = [(int(r["vec_id"]), int(r["label"]), list(r["embedding"])) for r in rows]
    by_label: dict[int, list[list[float]]] = defaultdict(list)
    for _, lab, v in vecs:
        by_label[lab].append(v)
    protos = {}
    for lab, vs in by_label.items():
        dim = len(vs[0])
        protos[lab] = [
            round(math.fsum(float(v[i]) for v in vs) / len(vs), 4) + 0.0
            for i in range(dim)
        ]
    return vecs, protos


def _dist_seq(v, p) -> float:
    """The engine's ordered fold + sqrt."""
    acc = 0.0
    for i in range(len(p)):
        d = float(v[i]) - p[i]
        acc = acc + d * d
    return math.sqrt(acc)


class TestSilhouette:
    def test_integer_recompute(self, spark):
        vecs, protos = _protos_ref(spark)
        agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for _, lab, v in vecs:
            a = math.floor(_dist_seq(v, protos[lab]) * 1000000 + 0.5)
            b = math.floor(
                min(_dist_seq(v, p) for l, p in protos.items() if l != lab)
                * 1000000 + 0.5
            )
            m = max(a, b)
            # truncation toward zero, matching Spark div / DuckDB //
            num = (b - a) * 1000000
            s = 0 if m == 0 else (abs(num) // m) * (1 if num >= 0 else -1)
            agg[lab][0] += 1
            agg[lab][1] += s
        expect = {
            lab: (n, (abs(t) // n) * (1 if t >= 0 else -1))
            for lab, (n, t) in agg.items()
        }
        got = {
            r["label"]: (r["n_members"], r["mean_silhouette_ppm"])
            for r in _run(spark, "embed_silhouette_labels")
        }
        assert got == expect

    def test_bounds(self, spark):
        rows = _run(spark, "embed_silhouette_labels")
        assert all(-1000000 <= r["mean_silhouette_ppm"] <= 1000000 for r in rows)


class TestDaviesBouldin:
    def test_integer_recompute(self, spark):
        vecs, protos = _protos_ref(spark)
        n: dict[int, int] = defaultdict(int)
        asum: dict[int, int] = defaultdict(int)
        for _, lab, v in vecs:
            n[lab] += 1
            asum[lab] += math.floor(_dist_seq(v, protos[lab]) * 1000000 + 0.5)
        sigma = {lab: asum[lab] // n[lab] for lab in n}
        expect = {}
        for i in protos:
            best = None
            for j in protos:
                if j == i:
                    continue
                dm = math.floor(_dist_seq(protos[i], protos[j]) * 1000000 + 0.5)
                r = 10**12 if dm == 0 else ((sigma[i] + sigma[j]) * 1000000) // dm
                if best is None or r > best[0] or (r == best[0] and j < best[1]):
                    best = (r, j)
            expect[i] = (n[i], sigma[i], best[1], best[0])
        got = {
            r["label"]: (
                r["n_members"], r["sigma_micro"],
                r["worst_other_label"], r["worst_ratio_ppm"],
            )
            for r in _run(spark, "embed_davies_bouldin")
        }
        assert got == expect
