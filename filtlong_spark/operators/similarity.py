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


N_PLANES = 8      # 2^8 = 256 sign buckets
PLANE_MOD = 2001  # integer weights in [-1000, 1000]
QUANT = 1000.0    # embedding quantization step for exact integer signs


def plane_matrix(dim: int, n_planes: int = N_PLANES):
    """Deterministic integer hyperplanes: plane p's weight for dim i =
    (first 8 md5 hex chars of 'p:i') mod 2001 - 1000. Integer weights x
    integer-quantized embeddings -> the sign computation is EXACT and
    engine-independent (mirrored verbatim in the DuckDB oracle SQL)."""
    import hashlib

    import numpy as np
    w = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
            w[p, i] = h % PLANE_MOD - (PLANE_MOD - 1) // 2
    return w


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket, en): sign-LSH bucket + L2-normalized embedding,
    computed in ONE numpy mapInPandas pass (a BLAS int matmul per Arrow
    batch) — no Catalyst HOFs, no per-element interpretation. Embeddings
    are quantized floor(x*1000 + 0.5) so the plane dot products are exact
    int64 in every engine."""
    import numpy as np
    import pandas as pd

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    dim = len(emb.select("embedding").first()["embedding"])
    w = plane_matrix(dim, n_planes)
    bits = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    def mapper(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            qE = np.floor(E * QUANT + 0.5).astype(np.int64)
            bucket = ((qE @ w.T) > 0).astype(np.int64) @ bits
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "bucket": bucket,
                                "en": list(En)})

    return emb.select("vec_id", "embedding").mapInPandas(
        mapper, schema="vec_id long, bucket long, en array<double>")


def _bucket_pair_cosines(joined: DataFrame) -> DataFrame:
    """(probe_id, vec_id, bucket, pn, en) -> + rounded cosine, via one
    vectorized numpy pass over the joined candidates."""
    import numpy as np
    import pandas as pd

    def cos_mapper(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            P = np.array(list(pdf["pn"]), dtype=np.float64)
            E = np.array(list(pdf["en"]), dtype=np.float64)
            cos = np.einsum("ij,ij->i", P, E)
            yield pd.DataFrame({"probe_id": pdf["probe_id"].to_numpy(),
                                "vec_id": pdf["vec_id"].to_numpy(),
                                "bucket": pdf["bucket"].to_numpy(),
                                "cos": cos})

    pairs = joined.select("probe_id", "vec_id", "bucket", "pn", "en") \
        .mapInPandas(cos_mapper,
                     schema="probe_id long, vec_id long, bucket long, "
                            "cos double")
    # round JVM-side like cosine_pairs (Spark/DuckDB share HALF_UP)
    return pairs.withColumn("cos", F.round("cos", 6))


def ann_lsh_candidates(emb: DataFrame, probe_max_id: int) -> DataFrame:
    """Bucketed ANN: probes join the corpus only within the same sign
    bucket — a shuffle equi-join on bucket id (no broadcast of the corpus,
    no cross product; the 100 TB shape when the probe set is too large to
    broadcast). Cosines for the surviving candidates come from a second
    vectorized numpy pass, rounded to 6dp for cross-engine determinism."""
    wb = lsh_buckets(emb)
    probes = (wb.filter(F.col("vec_id") <= probe_max_id)
              .select(F.col("vec_id").alias("probe_id"), "bucket",
                      F.col("en").alias("pn")))
    joined = (wb.join(probes, "bucket")
              .filter(F.col("probe_id") < F.col("vec_id")))
    return _bucket_pair_cosines(joined)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer alternative to sign-LSH.
# Deterministic throughout: centroid training is seeded by data order, so
# index builds are repeatable across runs/retries.
# ---------------------------------------------------------------------------

IVF_LISTS = 16
IVF_NPROBE = 4


def ivf_train(emb: DataFrame, n_lists: int = IVF_LISTS,
              sample: int = 4096, iters: int = 10):
    """Train the coarse quantizer: deterministic mini k-means (spherical —
    assignment by max cosine) over a driver-side SAMPLE (the standard IVF
    recipe: the index trains on a sample, assignment scans the corpus).
    Init = first n_lists sample vectors in vec_id order; empty clusters
    keep their previous centroid. Returns a normalized (n_lists, dim)
    numpy matrix."""
    import numpy as np
    rows = (emb.orderBy("vec_id").limit(sample)
            .select("embedding").collect())
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    k = min(n_lists, len(Xn))
    C = Xn[:k].copy()
    for _ in range(iters):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    C[j] = m / nrm
    return C


def ivf_assign(emb: DataFrame, centroids) -> DataFrame:
    """(vec_id, list_id, en): one numpy mapInPandas pass assigns every
    vector to its nearest centroid (BLAS matmul per Arrow batch)."""
    import numpy as np
    import pandas as pd

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    bc = emb.sparkSession.sparkContext.broadcast(centroids)

    def mapper(batches):
        C = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(list(pdf["embedding"]), dtype=np.float64)
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            lists = (En @ C.T).argmax(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].to_numpy(),
                                "list_id": lists, "en": list(En)})

    return emb.select("vec_id", "embedding").mapInPandas(
        mapper, schema="vec_id long, list_id long, en array<double>")


def ann_ivf_topk(emb: DataFrame, probe_max_id: int, k: int = 5,
                 n_lists: int = IVF_LISTS, nprobe: int = IVF_NPROBE
                 ) -> DataFrame:
    """IVF ANN top-k: corpus vectors live in ONE inverted list each;
    probes fan out to their nprobe nearest lists (multi-probe) and join
    only those lists — an equi-join on list_id, never a cross product.
    Exact cosines + top-k re-rank on candidates."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    C = ivf_train(emb, n_lists)
    assigned = ivf_assign(emb, C)
    bc = emb.sparkSession.sparkContext.broadcast((C, nprobe))

    def probe_mapper(batches):
        Cv, np_probe = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            P = np.array(list(pdf["en"]), dtype=np.float64)
            order = np.argsort(-(P @ Cv.T), axis=1)[:, :np_probe]
            ids = np.repeat(pdf["vec_id"].to_numpy(), order.shape[1])
            yield pd.DataFrame({
                "probe_id": ids,
                "list_id": order.reshape(-1).astype(np.int64),
                "pn": [p for p in pdf["en"] for _ in range(order.shape[1])],
            })

    probes = (assigned.filter(F.col("vec_id") <= probe_max_id)
              .select("vec_id", "en")
              .mapInPandas(probe_mapper,
                           schema="probe_id long, list_id long, "
                                  "pn array<double>"))
    joined = (assigned.join(probes, "list_id")
              .filter(F.col("probe_id") != F.col("vec_id"))
              .withColumnRenamed("list_id", "bucket"))
    pairs = _bucket_pair_cosines(
        joined.select("probe_id", "vec_id", "bucket", "pn", "en"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"),
                                               F.asc("vec_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "cos", "rank"))


def near_dup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine NEAR-DUP dedup over the whole corpus: bucket
    SELF-join (every vector probes its own sign bucket — still never
    all-pairs) + exact cosine filter on candidates. Returns (probe_id,
    vec_id, cos) with probe_id < vec_id, cos >= threshold. Near-identical
    vectors collide in all sign buckets with prob ~(1 - theta/pi)^8, so
    recall on true near-dups is ~1 while the join size is ~N^2/256 per
    skew-free bucket load."""
    wb = lsh_buckets(emb)
    probes = wb.select(F.col("vec_id").alias("probe_id"), "bucket",
                       F.col("en").alias("pn"))
    joined = (wb.join(probes, "bucket")
              .filter(F.col("probe_id") < F.col("vec_id")))
    return (_bucket_pair_cosines(joined)
            .filter(F.col("cos") >= threshold)
            .select("probe_id", "vec_id", "cos"))
