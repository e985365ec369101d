"""Bradley-Terry preference aggregation: fixed-point MM iterations
(operators/preference.py) against a float reference implementation,
plus the determinism and boundedness contracts."""

from __future__ import annotations

import pytest

from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
    UNIT,
    bt_strengths,
)


def _bt_float_ref(match_list, n_iters):
    """Float MM reference with the same max-normalization, no flooring."""
    players = sorted({p for m in match_list for p in m})
    n = {}
    w = {p: 0 for p in players}
    for winner, loser in match_list:
        key = tuple(sorted((winner, loser)))
        n[key] = n.get(key, 0) + 1
        w[winner] += 1
    p = {pl: 1.0 for pl in players}
    for _ in range(n_iters):
        d = {
            pl: sum(
                cnt / (p[a] + p[b])
                for (a, b), cnt in n.items()
                if pl in (a, b)
            )
            for pl in players
        }
        raw = {pl: (w[pl] / d[pl] if d[pl] else 0.0) for pl in players}
        mx = max(raw.values())
        p = {pl: raw[pl] / mx for pl in players}
    return p


MATCHES = (
    [("a", "b")] * 6
    + [("b", "a")] * 2
    + [("a", "c")] * 5
    + [("c", "a")] * 1
    + [("b", "c")] * 4
    + [("c", "b")] * 2
)


@pytest.fixture(scope="module")
def matches_df(spark):
    return spark.createDataFrame(MATCHES, "winner string, loser string")


def test_matches_float_reference_within_quantization(spark, matches_df):
    got = {
        r["player"]: r["strength_units"]
        for r in bt_strengths(matches_df, n_iters=5).collect()
    }
    ref = _bt_float_ref(MATCHES, n_iters=5)
    for pl, p_float in ref.items():
        # 5 rounds of floor-division quantization at 1e-6 resolution:
        # drift stays far below 1e-3 of the unit scale.
        assert abs(got[pl] / UNIT - p_float) < 1e-3, (pl, got[pl], p_float)


def test_winner_ordering_and_leader_pinned(spark, matches_df):
    rows = {
        r["player"]: r for r in bt_strengths(matches_df, n_iters=5).collect()
    }
    # a dominates b dominates c in MATCHES.
    assert rows["a"]["strength_units"] == UNIT  # leader max-normalized
    assert (
        rows["a"]["strength_units"]
        > rows["b"]["strength_units"]
        > rows["c"]["strength_units"]
        >= 1
    )


def test_win_and_match_totals(spark, matches_df):
    rows = {
        r["player"]: r for r in bt_strengths(matches_df, n_iters=5).collect()
    }
    assert rows["a"]["n_wins"] == 11 and rows["a"]["n_matches"] == 14
    assert rows["b"]["n_wins"] == 6 and rows["b"]["n_matches"] == 14
    assert rows["c"]["n_wins"] == 3 and rows["c"]["n_matches"] == 12


def test_zero_win_player_floors_at_one_unit(spark):
    df = spark.createDataFrame(
        [("a", "z")] * 3 + [("b", "z")] * 3, "winner string, loser string"
    )
    rows = {r["player"]: r for r in bt_strengths(df, n_iters=5).collect()}
    assert rows["z"]["n_wins"] == 0
    assert rows["z"]["strength_units"] >= 1  # floored, never a 0 denominator


def test_partitioning_invariance(spark, matches_df):
    a = sorted(map(tuple, bt_strengths(matches_df, n_iters=3).collect()))
    b = sorted(
        map(tuple, bt_strengths(matches_df.repartition(13), n_iters=3).collect())
    )
    assert a == b


def test_self_match_rows_rejected(spark):
    """ADVICE r8: a winner == loser row would double-count in the MM
    denominator (the sym union emits the (x, x) pair twice) — reject
    the corrupt log in-plan instead of skewing every strength."""
    import pytest

    from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
        match_matrix,
    )

    df = spark.createDataFrame(
        [("a", "b"), ("c", "c")], "winner string, loser string"
    )
    with pytest.raises(Exception, match="winner == loser"):
        match_matrix(df).collect()

    dfn = spark.createDataFrame(
        [("a", "b"), (None, "b")], "winner string, loser string"
    )
    with pytest.raises(Exception, match="null player"):
        match_matrix(dfn).collect()


def test_rejects_zero_iters(spark, matches_df):
    with pytest.raises(ValueError):
        bt_strengths(matches_df, n_iters=0)


class TestStreamingBtMatrix:
    """Log-structured pair-matrix maintenance
    (streaming/preference_stream.py): drained stream == one-shot batch,
    exactly-once under replay, and the mixed-log guard."""

    def _run_stream(self, spark, matches_df, base):
        import os

        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.preference_stream import (
            stream_into_bt_matrix,
        )
        from pyspark.sql import functions as F

        src, log, ckpt = (os.path.join(base, d) for d in ("src", "log", "ckpt"))
        split = F.crc32(F.concat_ws("|", "winner", "loser")) % 2
        matches_df.filter(split == 0).coalesce(1).write.parquet(f"{src}/f0")
        matches_df.filter(split == 1).coalesce(1).write.parquet(f"{src}/f1")
        stream = (
            spark.readStream.schema(matches_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = stream_into_bt_matrix(stream, log, ckpt)
        assert q.awaitTermination(120)
        return log

    def test_drained_fold_equals_batch_matrix(self, spark, matches_df, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
            match_matrix,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.preference_stream import (
            bt_matrix_read,
        )

        log = self._run_stream(spark, matches_df, str(tmp_path / "bt"))
        folded = sorted(map(tuple, bt_matrix_read(spark, log).collect()))
        batch = sorted(map(tuple, match_matrix(matches_df).collect()))
        assert folded == batch

    def test_replayed_batch_is_deduped(self, spark, matches_df, tmp_path):
        """A duplicated (batch_id, lo, hi) append — the foreachBatch
        retry shape — must not double-count."""
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
            match_matrix,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.preference_stream import (
            bt_matrix_read,
        )
        from pyspark.sql import functions as F

        log = self._run_stream(spark, matches_df, str(tmp_path / "bt2"))
        first = spark.read.parquet(log).filter(F.col("batch_id") == 0)
        first.write.mode("append").parquet(log)  # simulate the retry
        folded = sorted(map(tuple, bt_matrix_read(spark, log).collect()))
        batch = sorted(map(tuple, match_matrix(matches_df).collect()))
        assert folded == batch

    def test_mixed_log_rejected(self, spark, matches_df, tmp_path):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
            match_matrix,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.preference_stream import (
            bt_matrix_read,
        )
        from pyspark.sql import functions as F

        log = self._run_stream(spark, matches_df, str(tmp_path / "bt3"))
        match_matrix(matches_df).withColumn(
            "batch_id", F.lit(None).cast("long")
        ).write.mode("append").parquet(log)  # legacy unstamped append
        # in-plan guard: fires at the first action over the mixed log
        with pytest.raises(Exception, match="null and stamped"):
            bt_matrix_read(spark, log).collect()

    def test_strengths_from_folded_matrix_match_batch(
        self, spark, matches_df, tmp_path
    ):
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.operators.preference import (
            bt_strengths_from_matrix,
        )
        from postgresql_vector_search_pgvector__for_pdf_file_on_blob_storage_english_spark.streaming.preference_stream import (
            bt_matrix_read,
        )

        log = self._run_stream(spark, matches_df, str(tmp_path / "bt4"))
        streamed = sorted(
            map(
                tuple,
                bt_strengths_from_matrix(
                    bt_matrix_read(spark, log), n_iters=3
                ).collect(),
            )
        )
        batch = sorted(map(tuple, bt_strengths(matches_df, n_iters=3).collect()))
        assert streamed == batch
