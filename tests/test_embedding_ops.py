"""Embedding transforms (random projection, int8 quantization) and the
as-of tolerance variant, checked against plain-python references."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dcafs_spark.operators.embedding_ops import (
    projection_planes,
    quantize_int8,
    random_projection,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestRandomProjection:
    def test_matches_python_dot(self, spark, emb):
        planes = projection_planes(64, 8, 7)
        out = random_projection(emb.select("vec_id", "embedding"), k=8, seed=7, dim=64)
        got = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in out.collect()}
        src = {r["vec_id"]: list(r["embedding"]) for r in emb.select("vec_id", "embedding").collect()}
        for vid, vec in src.items():
            for j in range(8):
                want = 0.0
                for i in range(64):  # same sequential fold order as the Column plan
                    want += float(vec[i]) * planes[j][i]
                assert got[vid][j] == pytest.approx(round(want, 6), abs=1e-6)

    def test_norm_preserved_in_expectation(self, emb):
        # JL sanity: mean ratio ||Px||^2 / ||x||^2 ~ 1 across the corpus
        out = random_projection(emb.select("vec_id", "embedding"), k=8, seed=7, dim=64)
        joined = out.join(emb.select("vec_id", "embedding"), "vec_id")
        proj_sq = sum(F.col(f"p{j}") * F.col(f"p{j}") for j in range(8))
        orig_sq = F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
        ratio = joined.select(F.avg(proj_sq / orig_sq).alias("r")).first()["r"]
        assert 0.7 < ratio < 1.3

    def test_no_shuffle_in_plan(self, emb):
        plan = random_projection(emb.select("vec_id", "embedding"))._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # narrow map: must run at scan speed


class TestQuantizeInt8:
    def test_matches_python(self, emb):
        out = quantize_int8(emb.select("vec_id", "embedding"))
        got = {r["vec_id"]: r.asDict() for r in out.collect()}
        src = {r["vec_id"]: list(r["embedding"]) for r in emb.select("vec_id", "embedding").collect()}
        for vid, vec in src.items():
            maxabs = max(abs(float(x)) for x in vec)
            scale = 127.0 / maxabs if maxabs > 0 else 1.0
            # HALF_UP == away-from-zero for the same double product
            q = [int(math.floor(abs(float(x)) * scale + 0.5)) * (1 if x >= 0 else -1) for x in vec]
            r = got[vid]
            assert r["q_sum"] == sum(q)
            assert r["q_min"] == min(min(q), 127)
            assert r["q_max"] == max(max(q), -127)
            assert r["q_nnz"] == sum(1 for x in q if x != 0)
            assert r["q_sq_sum"] == sum(x * x for x in q)

    def test_range_bounded(self, emb):
        out = quantize_int8(emb.select("vec_id", "embedding"))
        bad = out.filter((F.col("q_min") < -127) | (F.col("q_max") > 127)).count()
        assert bad == 0


class TestAsofTolerance:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "a", 100), (2, "a", 250), (3, "a", 1000), (4, "b", 50)],
            "id int, k string, t long",
        )
        right = spark.createDataFrame(
            [("a", 90, 9.0), ("a", 240, 24.0), ("b", 60, 6.0)],
            "k string, rt long, payload double",
        )
        return left, right

    def test_tolerance_nulls_stale_match(self, spark):
        from dcafs_spark.operators.asof import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", tolerance=100)
        rows = {r["id"]: r["asof_payload"] for r in out.collect()}
        assert rows[1] == 9.0      # gap 10 <= 100
        assert rows[2] == 24.0     # gap 10 <= 100
        assert rows[3] is None     # gap 760 > 100 -> nulled
        assert rows[4] is None     # no preceding right row at t=50

    def test_null_payload_in_matched_row_stays_null(self, spark):
        """Row semantics under NULL payloads (round-5 ADVICE): the
        matched right row's values are taken ATOMICALLY — a NULL
        payload in the newest matched row must NOT resurrect an older
        non-null value, and the tolerance check must pair the value
        with ITS OWN row's timestamp (pandas merge_asof parity)."""
        import pandas as pd

        from dcafs_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, "a", 100), (2, "a", 260), (3, "a", 1000)],
            "id int, k string, t long",
        )
        # newest right row at rt=250 has a NULL payload
        right = spark.createDataFrame(
            [("a", 90, 9.0), ("a", 250, None)],
            "k string, rt long, payload double",
        )
        out = asof_join(left, right, on="k", left_ts="t", right_ts="rt")
        rows = {r["id"]: r["asof_payload"] for r in out.collect()}
        assert rows[1] == 9.0   # only rt=90 precedes t=100
        assert rows[2] is None  # matched row rt=250 has NULL payload — not 9.0
        assert rows[3] is None  # same: newest match wins, NULL rides along
        # with tolerance: the stale rt=90 value must not be validated
        # against the newer rt=250 row's timestamp
        out_tol = asof_join(left, right, on="k", left_ts="t", right_ts="rt", tolerance=50)
        rows_tol = {r["id"]: r["asof_payload"] for r in out_tol.collect()}
        assert rows_tol[1] == 9.0   # gap 10 <= 50
        assert rows_tol[2] is None  # matched row is rt=250 (gap 10) but its payload is NULL
        assert rows_tol[3] is None  # gap 750 > 50
        # pandas agreement on the same frames
        lp = pd.DataFrame([(1, "a", 100), (2, "a", 260), (3, "a", 1000)], columns=["id", "k", "t"])
        rp = pd.DataFrame([("a", 90, 9.0), ("a", 250, None)], columns=["k", "rt", "payload"])
        want = pd.merge_asof(lp, rp, left_on="t", right_on="rt", by="k", direction="backward")
        for _, row in want.iterrows():
            g = rows[row["id"]]
            assert (g is None) == pd.isna(row["payload"]) and (g is None or g == row["payload"])

    def test_matches_pandas_merge_asof(self, spark):
        import pandas as pd

        from dcafs_spark.operators.asof import asof_join

        rng = random.Random(11)
        left = [(i, "k%d" % rng.randrange(3), rng.randrange(10_000)) for i in range(200)]
        # rt unique per row: equal-rt ties would make both engines'
        # "which of the tied rows wins" partition/sort-order-dependent
        right = [("k%d" % rng.randrange(3), (i * 123) % 9973, float(i)) for i in range(80)]
        ldf = spark.createDataFrame(left, "id int, k string, t long")
        rdf = spark.createDataFrame(right, "k string, rt long, payload double")
        got = {
            r["id"]: r["asof_payload"]
            for r in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="rt", tolerance=500).collect()
        }
        lp = pd.DataFrame(left, columns=["id", "k", "t"]).sort_values("t", kind="stable")
        rp = (
            pd.DataFrame(right, columns=["k", "rt", "payload"])
            .sort_values(["rt", "payload"], kind="stable")  # ties: last wins, like last_value
        )
        want = pd.merge_asof(
            lp, rp, left_on="t", right_on="rt", by="k", tolerance=500, direction="backward"
        )
        for _, row in want.iterrows():
            g = got[row["id"]]
            if pd.isna(row["payload"]):
                assert g is None, row["id"]
            else:
                assert g == row["payload"], row["id"]


def test_quantize_nan_inf_null_all_summaries(spark):
    """A non-finite component must null EVERY summary together:
    least/greatest skip NULL codes, so without the q_sum gate a NaN
    vector emitted the fold's impossible (q_min=127, q_max=-127)
    sentinel and a partial q_nnz as if they were real statistics
    (round-10 review, reproduced live)."""
    from dcafs_spark.operators.embedding_ops import quantize_int8

    rows = [
        (0, [float("nan")]),
        (1, [float("inf"), 1.0]),
        (2, [1.0, -2.0]),
        (3, []),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    for vid in (0, 1, 3, 4):
        r = got[vid]
        assert all(
            r[c] is None for c in ("q_sum", "q_min", "q_max", "q_nnz", "q_sq_sum")
        ), (vid, r)
    ok = got[2]  # finite vector still quantizes: scale=127/2
    assert (ok["q_min"], ok["q_max"], ok["q_nnz"]) == (-127, 64, 2)
    assert ok["q_sum"] == -63 and ok["q_sq_sum"] == 64 * 64 + 127 * 127


class TestProductQuantization:
    def test_kmeans_l2_matches_numpy_lloyds(self, spark):
        """Distributed euclidean Lloyd's equals a numpy reference with
        the same deterministic init (first-k by id) and iteration
        count, including the first-min tie rule."""
        import numpy as np

        from dcafs_spark.operators.similarity import kmeans_train_l2

        rng = np.random.RandomState(3)
        X = rng.randn(60, 4).round(3)
        df = spark.createDataFrame(
            [(i, [float(x) for x in X[i]]) for i in range(60)],
            "vec_id long, embedding array<double>",
        )
        got = kmeans_train_l2(df, k=4, dim=4, iters=4, vec_col="embedding")

        cents = X[:4].astype(float).copy()
        for _ in range(4):
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # numpy argmin = first min
            new = cents.copy()
            for c in range(4):
                if (assign == c).any():
                    new[c] = X[assign == c].mean(axis=0)
            if np.allclose(new, cents, rtol=0, atol=0):
                break
            cents = new
        assert np.allclose(np.array(got), cents, atol=1e-9)

    def test_pq_encode_and_adc_reconstruction(self, spark):
        """Vectors sitting exactly ON codebook centroids encode to
        those centroids and score ADC distance equal to the true
        squared distance from the query."""
        from pyspark.sql import functions as F

        from dcafs_spark.operators.similarity import pq_adc_distance, pq_code

        # m=2 subspaces of dim 2, k=2 entries each
        books = [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [-1.0, -1.0]]]
        rows = [
            (1, [0.0, 0.0, 2.0, 2.0]),   # codes (0, 0)
            (2, [1.0, 1.0, -1.0, -1.0]), # codes (1, 1)
        ]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        query = [0.0, 0.0, 0.0, 0.0]
        out = {
            r["vec_id"]: (list(r["c"]), r["adc"])
            for r in df.select(
                "vec_id",
                pq_code(F.col("v"), books).alias("c"),
                pq_adc_distance(pq_code(F.col("v"), books), query, books).alias("adc"),
            ).collect()
        }
        assert out[1][0] == [0, 0] and abs(out[1][1] - 8.0) < 1e-12   # 0 + (2²+2²)
        assert out[2][0] == [1, 1] and abs(out[2][1] - 4.0) < 1e-12   # (1+1) + (1+1)

    def test_pq_quantized_mode_matches_raw(self, spark):
        """quantize_micro changes comparison arithmetic, not answers,
        away from micro-unit ties."""
        from pyspark.sql import functions as F

        from dcafs_spark.operators.similarity import pq_code, pq_codebooks_fixed

        books = pq_codebooks_fixed(8, 2, 4, seed=5)
        rows = [(i, [float((i * 7 + j * 3) % 11) / 11 for j in range(8)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        raw = df.select(pq_code(F.col("v"), books).alias("c")).collect()
        qtz = df.select(pq_code(F.col("v"), books, quantize_micro=True).alias("c")).collect()
        assert [list(r["c"]) for r in raw] == [list(r["c"]) for r in qtz]
