"""Round-12 query entries vs independent python references at sf0.001:
Kruskal-Wallis (exact-rational textbook H), Brier/Murphy decomposition
(per-bin Fraction recompute), position-based attribution (brute-force
per-conversion credit), Adamic-Adar (neighbor-set brute force), SCD2
point-in-time join (per-user linear scan), RAKE (direct deg/freq
recompute), and the streaming Markov replay (batch-twin parity).  The
DuckDB oracle gate covers cross-engine equality; these pin SEMANTICS
against derivations that share no code with the engine."""

from __future__ import annotations

import math
import re
from collections import defaultdict
from fractions import Fraction

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries import (
    REGISTRY,
)

SF = "/root/testdata/sf0.001"


class TestKruskalWallis:
    def test_textbook_h_parity(self, spark):
        import pyspark.sql.functions as F

        orders = spark.read.parquet(f"{SF}/orders.parquet").select(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("v"),
            "o_orderpriority",
        )
        rows = [(int(r["v"]), r["o_orderpriority"]) for r in orders.collect()]
        # average ranks with ties, exact rationals
        by_v: dict[int, list[str]] = defaultdict(list)
        for v, g in rows:
            by_v[v].append(g)
        rank_sum: dict[str, Fraction] = defaultdict(Fraction)
        n_g: dict[str, int] = defaultdict(int)
        below = 0
        tie_t = 0
        for v in sorted(by_v):
            t = len(by_v[v])
            avg_rank = Fraction(2 * below + t + 1, 2)
            for g in by_v[v]:
                rank_sum[g] += avg_rank
                n_g[g] += 1
            below += t
            tie_t += t**3 - t
        n = len(rows)
        s = sum(rs * rs / n_g[g] for g, rs in rank_sum.items())
        h = Fraction(12, n * (n + 1)) * s - 3 * (n + 1)
        hc = h / (1 - Fraction(tie_t, n**3 - n))
        out = REGISTRY["stats_kruskal_wallis"][0](spark, SF).collect()[0]
        assert out["n_total"] == n
        assert out["tie_t"] == tie_t
        assert out["h_micro"] == pytest.approx(float(h) * 1e6, abs=2)
        assert out["hc_micro"] == pytest.approx(float(hc) * 1e6, abs=2)


class TestBrierDecomposition:
    def test_fraction_recompute(self, spark):
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            F.col("n_chars").cast("long").alias("sc"),
            F.col("source").isin("src0", "src1", "src2", "src3", "src4")
            .cast("long")
            .alias("y"),
        )
        rows = [(int(r["sc"]), int(r["y"])) for r in docs.collect()]
        lo = min(s for s, _ in rows)
        hi = max(s for s, _ in rows)
        B = 10
        bins: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for s, y in rows:
            k = ((s - lo) * B) // (hi - lo + 1)
            bins[k][0] += 1
            bins[k][1] += y
        nn = len(rows)
        pp = sum(y for _, y in rows)
        out = {
            r["bin"]: r
            for r in REGISTRY["eval_brier_decomposition"][0](spark, SF).collect()
        }
        assert set(out) == set(bins)
        for k, (n, pos) in bins.items():
            p = Fraction(2 * k + 1, 2 * B)
            brier = (n * p * p - 2 * p * pos + pos) / nn
            rel = n * (p - Fraction(pos, n)) ** 2 / nn
            res = n * (Fraction(pos, n) - Fraction(pp, nn)) ** 2 / nn
            r = out[k]
            assert r["n"] == n and r["pos"] == pos
            assert r["brier_contrib_ppm"] == (brier * 10**6).__floor__()
            assert r["rel_contrib_ppm"] == (rel * 10**6).__floor__()
            assert r["res_contrib_ppm"] == (res * 10**6).__floor__()

    def test_murphy_identity_exact(self, spark):
        """REL - RES + UNC == Brier holds exactly in rationals for the
        bin-constant forecaster (sanity of the decomposition itself)."""
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            F.col("n_chars").cast("long").alias("sc"),
            F.col("source").isin("src0", "src1", "src2", "src3", "src4")
            .cast("long")
            .alias("y"),
        )
        rows = [(int(r["sc"]), int(r["y"])) for r in docs.collect()]
        lo, hi = min(s for s, _ in rows), max(s for s, _ in rows)
        B = 10
        bins: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for s, y in rows:
            k = ((s - lo) * B) // (hi - lo + 1)
            bins[k][0] += 1
            bins[k][1] += y
        nn = len(rows)
        pp = sum(y for _, y in rows)
        ybar = Fraction(pp, nn)
        brier = rel = res = Fraction(0)
        for k, (n, pos) in bins.items():
            p = Fraction(2 * k + 1, 2 * B)
            brier += (n * p * p - 2 * p * pos + pos)
            rel += n * (p - Fraction(pos, n)) ** 2
            res += n * (Fraction(pos, n) - ybar) ** 2
        unc = ybar * (1 - ybar)
        assert Fraction(brier, nn) == Fraction(rel, nn) - Fraction(res, nn) + unc


class TestAttributionPosition:
    def test_bruteforce_credit(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            _events,
        )
        import pyspark.sql.functions as F

        W = 7 * 24 * 3600 * 1000
        ev = _events(spark, SF).select(
            "event_id", "user_id", "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("vc"),
            F.unix_millis("ts").alias("ms"),
        )
        rows = [
            (int(r["event_id"]), int(r["user_id"]), r["event_type"], int(r["vc"]),
             int(r["ms"]))
            for r in ev.collect()
        ]
        touches = defaultdict(list)
        for eid, uid, et, vc, ms in rows:
            if et in ("click", "view"):
                touches[uid].append((ms, eid, et))
        agg = defaultdict(lambda: [0, 0, 0])  # touch -> n, credit, rev
        for eid, uid, et, vc, ms in rows:
            if et != "purchase":
                continue
            cand = sorted(
                t
                for t in touches[uid]
                if (t[0], t[1]) < (ms, eid) and ms - t[0] <= W
            )
            m = len(cand)
            if m == 0:
                agg["unattributed"][0] += 1
                agg["unattributed"][1] += 1_000_000
                agg["unattributed"][2] += 1_000_000 * vc
                continue
            for rk, (_tms, _tid, ttype) in enumerate(cand, start=1):
                if m == 1:
                    c = 1_000_000
                elif m == 2:
                    c = 500_000
                elif rk == 1:
                    c = 400_000
                elif rk == m:
                    c = 400_000 + (200_000 - (200_000 // (m - 2)) * (m - 2))
                else:
                    c = 200_000 // (m - 2)
                agg[ttype][0] += 1
                agg[ttype][1] += c
                agg[ttype][2] += c * vc
        out = {
            r["touch"]: r
            for r in REGISTRY["events_attribution_position"][0](spark, SF).collect()
        }
        assert set(out) == set(agg)
        for touch, (n, cr, rev) in agg.items():
            assert out[touch]["n_touches"] == n
            assert out[touch]["credit_ppm"] == cr
            assert out[touch]["credited_rev_microcents"] == rev

    def test_credits_sum_to_unit_per_conversion(self):
        """The U-shaped split sums to exactly 10^6 for every m."""
        for m in range(1, 40):
            total = 0
            for rk in range(1, m + 1):
                if m == 1:
                    total += 1_000_000
                elif m == 2:
                    total += 500_000
                elif rk == 1:
                    total += 400_000
                elif rk == m:
                    total += 400_000 + (200_000 - (200_000 // (m - 2)) * (m - 2))
                else:
                    total += 200_000 // (m - 2)
            assert total == 1_000_000, m


class TestAdamicAdar:
    def test_neighbor_set_bruteforce(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        )
        by_order = defaultdict(set)
        for r in li.collect():
            by_order[int(r["l_orderkey"])].add(int(r["l_partkey"]))
        edges = set()
        for parts in by_order.values():
            ps = sorted(parts)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    edges.add((ps[i], ps[j]))
        nbrs = defaultdict(set)
        for u, v in edges:
            nbrs[u].add(v)
            nbrs[v].add(u)
        CAP = 64
        term = {
            z: 10**12 // math.floor(math.log(len(n)) * 1e6 + 0.5)
            for z, n in nbrs.items()
            if 2 <= len(n) <= CAP
        }
        scores = defaultdict(lambda: [0, 0])  # (u,w) -> [cn, aa]
        for z, t in term.items():
            ns = sorted(nbrs[z])
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    key = (ns[i], ns[j])
                    scores[key][0] += 1
                    scores[key][1] += t
        ranked = sorted(
            (
                (aa, cn, u, w)
                for (u, w), (cn, aa) in scores.items()
                if (u, w) not in edges
            ),
            key=lambda x: (-x[0], -x[1], x[2], x[3]),
        )[:20]
        out = REGISTRY["graph_adamic_adar"][0](spark, SF).collect()
        assert len(out) == len(ranked)
        for row, (aa, cn, u, w) in zip(out, ranked):
            assert (row["u"], row["w"], row["cn"], row["aa_micro"]) == (u, w, cn, aa)
            assert row["deg_u"] == len(nbrs[u]) and row["deg_w"] == len(nbrs[w])


class TestScd2PitJoin:
    def test_linear_scan_parity(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            _events,
        )
        import pyspark.sql.functions as F

        ev = _events(spark, SF).filter(F.col("user_id") % 499 == 7).select(
            "event_id", "user_id", "event_type",
            F.unix_micros("ts").alias("us"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        )
        rows = sorted(
            (
                (int(r["user_id"]), int(r["us"]), int(r["event_id"]),
                 r["event_type"], r["ts_s"])
                for r in ev.collect()
            ),
            key=lambda x: (x[0], x[1], x[2]),
        )
        expected = {}
        cur_state: dict[int, tuple[str, str]] = {}
        for uid, _us, eid, et, ts_s in rows:
            if et == "purchase":
                st, vf = cur_state.get(uid, ("none", None))
                expected[eid] = (uid, st, vf)
            elif uid not in cur_state or cur_state[uid][0] != et:
                cur_state[uid] = (et, ts_s)
        out = REGISTRY["events_scd2_pit_join"][0](spark, SF).collect()
        assert len(out) == len(expected)
        for r in out:
            uid, st, vf = expected[r["p_id"]]
            assert (r["user_id"], r["state"], r["valid_from"]) == (uid, st, vf)


class TestRakeKeywords:
    def test_direct_recompute(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        stop = {"the", "a", "an", "of", "and", "to", "in", "is", "it", "that"}
        keep = re.compile(r"^[a-z]{2,}$")
        occs = []
        for r in docs.collect():
            toks = [
                t.lower()
                for t in re.sub(r"\s{2,}", " ", r["text"].replace("\n", " "))
                .strip()
                .split(" ")
                if t
            ]
            run: list[str] = []
            for t in toks:
                if keep.match(t) and t not in stop:
                    run.append(t)
                elif run:
                    occs.append(run)
                    run = []
            if run:
                occs.append(run)
        occs = [o for o in occs if len(o) <= 4]
        freq: dict[str, int] = defaultdict(int)
        deg: dict[str, int] = defaultdict(int)
        for o in occs:
            for w in o:
                freq[w] += 1
                deg[w] += len(o)
        ws = {w: (deg[w] * 10**6) // freq[w] for w in freq}
        agg = defaultdict(lambda: [0, 0])  # phrase -> [n_occ, score]
        for o in occs:
            p = " ".join(o)
            agg[p][0] += 1
            agg[p][1] = sum(ws[w] for w in o)
        ranked = sorted(
            ((s, n, p) for p, (n, s) in agg.items()),
            key=lambda x: (-x[0], -x[1], x[2]),
        )[:20]
        out = REGISTRY["text_rake_keywords"][0](spark, SF).collect()
        assert len(out) == len(ranked)
        for row, (s, n, p) in zip(out, ranked):
            assert (row["phrase"], row["n_occ"], row["score_ppm"]) == (p, n, s)
            assert row["n_words"] == len(p.split(" "))


class TestStreamMarkovReplay:
    def test_batch_twin_parity(self, spark):
        streamed = sorted(
            map(tuple, REGISTRY["stream_markov_replay"][0](spark, SF).collect())
        )
        batch = sorted(
            map(tuple, REGISTRY["events_markov_transitions"][0](spark, SF).collect())
        )
        assert streamed == batch


class TestPrAuc:
    def test_threshold_sweep_recompute(self, spark):
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            F.col("n_chars").cast("long").alias("s"),
            F.col("source").isin("src0", "src1", "src2", "src3", "src4")
            .cast("long")
            .alias("y"),
        )
        per: dict[int, list[int]] = defaultdict(lambda: [0, 0])
        for r in docs.collect():
            per[int(r["s"])][0] += int(r["y"])
            per[int(r["s"])][1] += 1 - int(r["y"])
        tp = fp = 0
        wsum = 0
        for s in sorted(per, reverse=True):
            pos, neg = per[s]
            tp += pos
            fp += neg
            wsum += pos * ((tp * 10**6) // (tp + fp))
        out = REGISTRY["eval_pr_auc_doclen"][0](spark, SF).collect()[0]
        assert out["n_pos"] == tp and out["n_neg"] == fp
        assert out["n_thresholds"] == len(per)
        assert out["ap_ppm"] == wsum // tp

    def test_perfect_and_inverted_rankers_bracket(self, spark):
        """Sanity on the metric itself: AP of the doclen scorer must lie
        strictly between the prevalence baseline and 1.0."""
        out = REGISTRY["eval_pr_auc_doclen"][0](spark, SF).collect()[0]
        prevalence_ppm = out["n_pos"] * 10**6 // (out["n_pos"] + out["n_neg"])
        assert prevalence_ppm * 0.5 < out["ap_ppm"] <= 10**6


class TestQuantileNormalize:
    def test_rank_mapping_recompute(self, spark):
        docs = [
            (int(r["doc_id"]), r["source"], int(r["n_chars"]))
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "n_chars")
            .collect()
        ]
        pooled = sorted((sc, did) for did, _s, sc in docs)
        by_src: dict[str, list] = defaultdict(list)
        for did, src, sc in docs:
            by_src[src].append((sc, did))
        n = len(docs)
        expected = {}
        for src, rows in by_src.items():
            rows.sort()
            for rk, (sc, did) in enumerate(rows):
                if did % 29 == 0:
                    expected[did] = (src, sc, pooled[(rk * n) // len(rows)][0])
        out = REGISTRY["scores_quantile_normalize"][0](spark, SF).collect()
        assert len(out) == len(expected)
        for r in out:
            src, sc, norm = expected[r["doc_id"]]
            assert (r["source"], r["score"], r["norm_score"]) == (src, sc, norm)

    def test_normalized_sources_share_quantiles(self, spark):
        """The operator's purpose: after normalization, each source's
        rank-k value is drawn from ONE pooled distribution, so the
        normalized minimum over a source's gated rows can never be an
        outlier of the pooled score range."""
        import pyspark.sql.functions as F

        pooled = spark.read.parquet(f"{SF}/documents.parquet").agg(
            F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
        ).first()
        out = REGISTRY["scores_quantile_normalize"][0](spark, SF).collect()
        assert all(pooled["lo"] <= r["norm_score"] <= pooled["hi"] for r in out)


class TestUserEntropyBots:
    def test_micro_nats_recompute(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            _events,
        )

        ev = _events(spark, SF).select("user_id", "event_type").collect()
        per: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        for r in ev:
            per[int(r["user_id"])][r["event_type"]] += 1
        def lnm(x: int) -> int:
            return math.floor(math.log(x) * 1e6 + 0.5)
        scored = []
        for uid, counts in per.items():
            n = sum(counts.values())
            if n < 20:
                continue
            h = (n * lnm(n) - sum(c * lnm(c) for c in counts.values())) // n
            scored.append((h, uid, n, len(counts)))
        scored.sort()
        out = REGISTRY["events_user_entropy_bots"][0](spark, SF).collect()
        assert len(out) == min(20, len(scored))
        for row, (h, uid, n, k) in zip(out, scored[:20]):
            assert (row["user_id"], row["n_events"], row["n_types"],
                    row["entropy_micro"]) == (uid, n, k, h)


class TestCramersV:
    def test_quantized_cell_sum_recompute(self, spark):
        docs = [
            (r["lang"], r["source"])
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("lang", "source")
            .collect()
        ]
        n = len(docs)
        rt: dict[str, int] = defaultdict(int)
        ct: dict[str, int] = defaultdict(int)
        obs: dict[tuple, int] = defaultdict(int)
        for la, src in docs:
            rt[la] += 1
            ct[src] += 1
            obs[(la, src)] += 1
        chi2_micro = 0
        for la in rt:
            for src in ct:
                e = rt[la] * ct[src] / n
                o = obs.get((la, src), 0)
                chi2_micro += math.floor((o - e) * (o - e) / e * 1e6 + 0.5)
        out = REGISTRY["stats_cramers_v_lang_source"][0](spark, SF).collect()[0]
        assert out["n_docs"] == n
        assert out["chi2_micro"] == chi2_micro
        assert out["dof"] == (len(rt) - 1) * (len(ct) - 1)
        v = math.sqrt(chi2_micro / 1e6 / (n * min(len(rt) - 1, len(ct) - 1)))
        assert out["cramers_v6"] == pytest.approx(round(v, 6), abs=1e-9)


class TestPageHinkley:
    def test_prefix_identity_recompute(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            _events,
        )
        import pyspark.sql.functions as F

        ev = _events(spark, SF)
        hourly = sorted(
            (r["hour"], int(r["cnt"]))
            for r in ev.groupBy(
                F.date_format(
                    F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00"
                ).alias("hour")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        s = i = m = 0
        min_m = 0
        scores = []
        for hour, cnt in hourly:
            s += cnt
            i += 1
            m += cnt * 10**6 - (s * 10**6) // i - 2_000_000
            min_m = min(min_m, m)
            scores.append((hour, cnt, m - min_m))
        top = sorted(scores, key=lambda x: (-x[2], x[0]))[:30]
        out = REGISTRY["events_page_hinkley"][0](spark, SF).collect()
        assert [(r["hour"], r["cnt"], r["ph_micro"]) for r in out] == top


class TestJsDivergence:
    def _recompute(self, spark):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.queries._base import (
            _t,
        )
        import re as _re

        docs = _t(spark, SF, "documents").select("source", "text").collect()
        per_st: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        for r in docs:
            toks = [
                t.lower()
                for t in _re.sub(r"\s{2,}", " ", r["text"].replace("\n", " "))
                .strip()
                .split(" ")
                if t
            ]
            for t in toks:
                per_st[r["source"]][t] += 1
        g: dict[str, int] = defaultdict(int)
        for src, cs in per_st.items():
            for t, c in cs.items():
                g[t] += c
        nt = sum(g.values())

        def lnm(x: int) -> int:
            return math.floor(math.log(x) * 1e6 + 0.5)

        def fdiv(a: int, b: int) -> int:
            return a // b  # python // floors, matching both engines

        exp = {}
        for src, cs in per_st.items():
            ns = sum(cs.values())
            nq = nt - ns
            kp = kq = 0
            for t, gt in g.items():
                c = cs.get(t, 0)
                d = gt - c
                if c > 0:
                    kp += c * (lnm(2 * c * nq) - lnm(c * nq + d * ns))
                if d > 0:
                    kq += d * (lnm(2 * d * ns) - lnm(d * ns + c * nq))
            exp[src] = (ns, nq, fdiv(fdiv(kp, ns) + fdiv(kq, nq), 2))
        return exp

    def test_micro_nats_recompute(self, spark):
        exp = self._recompute(spark)
        out = REGISTRY["text_js_divergence_sources"][0](spark, SF).collect()
        assert len(out) == len(exp)
        for r in out:
            ns, nq, jsd = exp[r["source"]]
            assert (r["n_tokens_src"], r["n_tokens_rest"], r["jsd_micro"]) == (
                ns, nq, jsd,
            )

    def test_jsd_bounds(self, spark):
        """JSD is bounded by [0, ln 2] (~693147 micro-nats); quantization
        slack stays within a few micro."""
        out = REGISTRY["text_js_divergence_sources"][0](spark, SF).collect()
        for r in out:
            assert -5 <= r["jsd_micro"] <= 693147 + 5
