"""Similarity search over an embedding column (array<float>).

- brute-force cosine: probe set x corpus, dot products via F.zip_with +
  F.aggregate (JVM-side fold in index order — deterministic summation).
  The probe side is tiny -> broadcast, so the "scan" side streams with no
  shuffle: at 100 TB this is one pass over the corpus.
- LSH-bucketed variant (random-hyperplane signs from the md5-derived
  deterministic planes) restricts candidates to matching sign-buckets —
  the scale path when the probe set is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    """Deterministic left-to-right fold of pairwise products."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_pairs(emb: DataFrame, probe_max_id: int,
                 threshold: float) -> DataFrame:
    """All (probe_id, vec_id, cos) with probe_id <= probe_max_id,
    probe_id < vec_id, round(cos, 6) >= threshold.

    Physical shape (the 100 TB pattern): the tiny probe side is collected
    and broadcast as a normalized numpy matrix; ONE mapInPandas pass over
    the corpus computes all cosines per Arrow batch with a BLAS matmul.
    No join, no shuffle — a single streaming scan. (A Catalyst HOF fold
    (F.aggregate) is interpreted per element per row and re-evaluated in
    every consuming expression — measured 10-100x slower and the dominant
    cost in early benches.)

    Rounded to 6dp so float-summation order can never flip the compare vs
    the SQL oracle."""
    import numpy as np
    import pandas as pd

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    spark = emb.sparkSession
    probes = (emb.filter(F.col("vec_id") <= probe_max_id)
              .select("vec_id", "embedding").collect())
    pids = np.array([r["vec_id"] for r in probes], dtype=np.int64)
    P = np.array([r["embedding"] for r in probes], dtype=np.float64)
    Pn = P / np.linalg.norm(P, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((pids, Pn))

    def mapper(batches):
        b_pids, b_pn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = En @ b_pn.T                       # (batch, n_probes)
            vids = pdf["vec_id"].to_numpy()
            mask = b_pids[None, :] < vids[:, None]   # probe_id < vec_id
            r, c = np.nonzero(mask)
            yield pd.DataFrame({"probe_id": b_pids[c], "vec_id": vids[r],
                                "cos": sims[r, c]})

    pairs = emb.select("vec_id", "embedding").mapInPandas(
        mapper, schema="probe_id long, vec_id long, cos double")
    return (pairs.withColumn("cos", F.round("cos", 6))
            .filter(F.col("cos") >= threshold)
            .select("probe_id", "vec_id", "cos"))


def cosine_topk(emb: DataFrame, probe_max_id: int, k: int) -> DataFrame:
    """Top-k neighbors per probe by (cos desc, vec_id asc). Window per
    probe — fine because the probe set is small; rank on the ROUNDED cosine
    for cross-engine determinism."""
    from pyspark.sql import Window
    pairs = cosine_pairs(emb, probe_max_id, threshold=-1.0)
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "cos", "rank"))


N_PLANES = 8


def lsh_bucket(emb_col) -> "F.Column":
    """Sign-LSH bucket id from N_PLANES deterministic pseudo-random
    hyperplanes: plane p's weight for dim i = (h(p,i) mod 2001 - 1000),
    h = first 8 md5 hex chars of 'p:i'. Integer weights -> the sign
    computation is exact and engine-independent."""
    def plane_sign(p):
        prods = F.zip_with(
            emb_col,
            F.sequence(F.lit(0), F.size(emb_col) - 1),
            lambda x, i: x.cast("double")
            * ((F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(str(p)), i.cast("string"))
                      .cast("binary")), 1, 8), 16, 10).cast("long")
                % 2001) - 1000).cast("double"))
        s = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(s > 0, F.lit(1)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for p in range(N_PLANES):
        bucket = bucket * 2 + plane_sign(p)
    return bucket


def ann_lsh_candidates(emb: DataFrame, probe_max_id: int) -> DataFrame:
    """Bucketed ANN: probes join the corpus only within the same sign
    bucket (equi-join on bucket id -> shuffle-partitioned, no broadcast of
    the corpus, no cross product). Returns candidate pairs with rounded
    cosine, for re-ranking."""
    with_b = emb.withColumn("bucket", lsh_bucket(F.col("embedding")))
    probes = (with_b.filter(F.col("vec_id") <= probe_max_id)
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("bucket"),
                      _as_double("embedding").alias("p")))
    corpus = with_b.select("vec_id", "bucket", _as_double("embedding").alias("e"))
    joined = corpus.join(probes, ["bucket"]).filter(
        F.col("probe_id") < F.col("vec_id"))
    cos = dot(F.col("p"), F.col("e")) / (norm(F.col("p")) * norm(F.col("e")))
    return (joined.withColumn("cos", F.round(cos, 6))
            .select("probe_id", "vec_id", "bucket", "cos"))
