"""SemDeDup centroid-training probe on an ANISOTROPIC fixture
(r11 verdict ask #5).

Round 11 measured that k-means training WORSENS cluster occupancy on
the near-isotropic synthetic corpus, while the operator docstring
claims training matters "on anisotropic real-encoder corpora" — an
untested assertion until this probe. Real encoder outputs concentrate
around a modest number of semantic directions, so the fixture plants
C latent unit directions and draws every vector as
``center[i % C] + lattice noise`` (the repo's exact-rational noise
convention, |noise| ≈ 0.35 vs unit centers → within-cone cosine ≈
0.94): direction-clustered, like contrastive-encoder output, unlike
the isotropic gaussians of the r11 rungs.

Measured per centroid set (random hyperplanes / L2-trained /
sphere-trained, k = C): assignment occupancy (max, mean — the knob
that bounds the within-cluster pair join, pairs ≈ Σnᵢ²) and the
wall time of the full semantic_dedup pass. Occupancy is deterministic;
wall time is single-shot after a JVM warmup. Results → SCALE.md.

Run: python scripts/semdedup_anisotropy_probe.py [N]
"""

from __future__ import annotations

import json
import math
import random
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dcafs_spark import get_spark  # noqa: E402
from dcafs_spark.operators.similarity import (  # noqa: E402
    dlit_array,
    hyperplanes,
    kmeans_train,
    kmeans_train_l2,
    semantic_dedup,
)

DIM = 64
C = 12  # latent direction cones


def latent_centers(seed: int = 97) -> list[list[float]]:
    rng = random.Random(seed)
    out = []
    for _ in range(C):
        v = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / n for x in v])
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    spark = get_spark("semdedup_anisotropy_probe")
    spark.sparkContext.setLogLevel("ERROR")

    centers = latent_centers()
    flat = dlit_array([x for c in centers for x in c])
    jj = F.sequence(F.lit(0), F.lit(DIM - 1))
    v = F.transform(
        jj,
        lambda j: F.element_at(flat, ((F.col("vec_id") % C) * DIM + j + 1).cast("int"))
        + ((F.col("vec_id") * 31 + j * 17) % 13 - 6) / 80.0,
    )
    emb = (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), v.alias("v"))
        .localCheckpoint()
    )

    # JVM/codegen warmup on a small slice
    semantic_dedup(emb.limit(512), hyperplanes(DIM, C, seed=33), 0.995,
                   id_col="vec_id", vec_col="v").write.format("noop").mode("overwrite").save()

    results = {}

    def probe(name: str, cents: list[list[float]], train_sec: float) -> None:
        t0 = time.perf_counter()
        out = semantic_dedup(emb, cents, 0.995, id_col="vec_id", vec_col="v")
        occ = out.groupBy("cluster").count().collect()
        wall = time.perf_counter() - t0
        sizes = [r["count"] for r in occ]
        results[name] = {
            "train_sec": round(train_sec, 2),
            "dedup_sec": round(wall, 2),
            "occ_max": max(sizes),
            "occ_mean": round(sum(sizes) / len(sizes), 1),
            "occ_ratio": round(max(sizes) / (sum(sizes) / len(sizes)), 2),
            "n_clusters_used": len(sizes),
        }
        print(name, json.dumps(results[name]), flush=True)

    probe("random_hyperplanes", hyperplanes(DIM, C, seed=33), 0.0)

    t0 = time.perf_counter()
    cents_l2 = kmeans_train_l2(emb, k=C, dim=DIM, iters=3, id_col="vec_id", vec_col="v")
    probe("trained_l2_3iter", cents_l2, time.perf_counter() - t0)

    t0 = time.perf_counter()
    cents_sp = kmeans_train(emb, k=C, dim=DIM, iters=3, id_col="vec_id", vec_col="v")
    probe("trained_sphere_3iter", cents_sp, time.perf_counter() - t0)

    print(json.dumps({"n": n, "dim": DIM, "cones": C, "results": results}))


if __name__ == "__main__":
    main()
