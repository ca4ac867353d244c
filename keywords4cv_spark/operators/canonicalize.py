"""Embedding-space canonicalization: LSH-bucketed DBSCAN dedup (A6).

Re-expresses the reference's keyword canonicalizer
(/root/reference/keyword_canonicalizer.py:233-326: L2-normalize →
DBSCAN(eps, min_samples, cosine) → pick representative :328-383) as a
Spark operator:

- partition the vector space with sign-random-projection buckets
  (similarity.lsh_buckets) so each `applyInPandas` group is bounded —
  DBSCAN is O(n²) within a group, never globally;
- run a tiny deterministic numpy DBSCAN per bucket (no sklearn in
  this container, and determinism needs ordered region queries anyway
  — the reference's label order is nondeterministic, SURVEY.md §7.4);
- representative = lowest vec_id in the cluster (the reference's
  whitelist > longest > centroid chain collapses to a stable rule at
  the engine level; callers can re-rank within `cluster member` sets).

Bucketing makes this approximate (cross-bucket neighbours are
missed), which is the standard scale tradeoff; eps-accurate global
DBSCAN at vocabulary size can run with n_planes=0 (single bucket).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from keywords4cv_spark.operators.similarity import lsh_buckets, n_planes_for

# bucket is LONG: the corpus-scaled plane count exceeds 31 bits of
# bucket id at web scale (similarity.n_planes_for)
OUT_SCHEMA = "vec_id long, bucket long, cluster int, rep_vec_id long, cluster_size int"


def dbscan_numpy(vecs: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Deterministic DBSCAN over cosine distance; labels: -1 = noise.

    Plain numpy re-implementation of the textbook algorithm (no
    sklearn in the image); visit order is row order, which callers pin
    by sorting on vec_id.
    """
    n = vecs.shape[0]
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    dist = 1.0 - unit @ unit.T
    neighbors = [np.nonzero(dist[i] <= eps)[0] for i in range(n)]
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or neighbors[i].size < min_samples:
            continue
        labels[i] = cluster
        seeds = list(neighbors[i])
        j = 0
        while j < len(seeds):
            q = seeds[j]
            j += 1
            if labels[q] == -1:
                labels[q] = cluster
                if neighbors[q].size >= min_samples:
                    seeds.extend(p for p in neighbors[q] if labels[p] == -1)
            elif labels[q] < 0:  # pragma: no cover - kept for clarity
                labels[q] = cluster
        cluster += 1
    return labels


def local_canonical_clusters(
    vec_ids,
    embeddings,
    eps: float = 0.25,
    min_samples: int = 2,
    n_planes: int | None = None,
) -> pd.DataFrame:
    """Spark-free twin of canonical_clusters (pure numpy/pandas).

    Materializes the DuckDB fixture oracle for the driver's correctness
    gate (iterative DBSCAN is not expressible in one SQL statement) and
    doubles as the pytest oracle. Projections are summed strictly
    left-to-right in float64 — the same order as Spark's ``aggregate``
    expression — so bucket sign bits match bit-for-bit.
    """
    ids = np.asarray(vec_ids, dtype=np.int64)
    mat = np.array([np.asarray(v, dtype=np.float64) for v in embeddings])
    n, d = mat.shape
    if n_planes is None:
        n_planes = n_planes_for(n)  # same corpus-scaled rule as Spark side
    from keywords4cv_spark.operators.similarity import plane_sign

    signs = np.array(
        [[float(plane_sign(j, i)) for i in range(d)] for j in range(n_planes)]
    )
    buckets = np.zeros(n, dtype=np.int64)
    for r in range(n):
        b = 0
        for j in range(n_planes):
            acc = 0.0
            row = mat[r] * signs[j]
            for x in row:  # sequential sum == Spark aggregate order
                acc += float(x)
            if acc > 0:
                b |= 1 << j
        buckets[r] = b
    frames = []
    for b in sorted(set(buckets.tolist())):
        sel = np.nonzero(buckets == b)[0]
        order = sel[np.argsort(ids[sel], kind="stable")]
        labels = dbscan_numpy(mat[order], eps, min_samples)
        sub = pd.DataFrame(
            {
                "vec_id": ids[order].astype("int64"),
                "bucket": np.int64(b),
                "cluster": labels.astype("int32"),
            }
        )
        reps = (
            sub[sub.cluster >= 0]
            .groupby("cluster")["vec_id"]
            .agg(["min", "count"])
            .rename(columns={"min": "rep_vec_id", "count": "cluster_size"})
        )
        sub = sub.merge(reps, left_on="cluster", right_index=True, how="left")
        noise = sub.cluster < 0
        sub.loc[noise, "rep_vec_id"] = sub.loc[noise, "vec_id"]
        sub.loc[noise, "cluster_size"] = 1
        sub["rep_vec_id"] = sub["rep_vec_id"].astype("int64")
        sub["cluster_size"] = sub["cluster_size"].astype("int32")
        frames.append(sub)
    return pd.concat(frames, ignore_index=True)


def canonical_clusters(
    emb: DataFrame,
    eps: float = 0.25,
    min_samples: int = 2,
    n_planes: int | None = None,
) -> DataFrame:
    """(vec_id, bucket, cluster, rep_vec_id, cluster_size); noise rows
    carry cluster = -1 and represent themselves.

    Plane count defaults to the corpus-scaled rule (n_planes_for) so the
    per-bucket O(bucket²) DBSCAN stays bounded as the vocabulary grows —
    a fixed count (16 buckets) gives ~10^15-op buckets at 10^9 terms
    (VERDICT r2 #3). Pass n_planes=0 for eps-exact global DBSCAN."""
    if n_planes is None:
        n_planes = n_planes_for(emb.count())
    b = lsh_buckets(emb, n_planes) if n_planes > 0 else emb.select(
        "vec_id"
    ).withColumn("bucket", (emb.vec_id * 0).cast("long"))
    withb = emb.join(b, "vec_id").select("vec_id", "bucket", "embedding")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas delivers each bucket whole (mapInPandas could split
        # a bucket across Arrow batches)
        bucket = int(g["bucket"].iloc[0])
        g = g.sort_values("vec_id", ignore_index=True)
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        labels = dbscan_numpy(vecs, eps, min_samples)
        out = pd.DataFrame(
            {
                "vec_id": g["vec_id"].astype("int64"),
                "bucket": bucket,
                "cluster": labels.astype("int32"),
            }
        )
        reps = (
            out[out.cluster >= 0]
            .groupby("cluster")["vec_id"]
            .agg(["min", "count"])
            .rename(columns={"min": "rep_vec_id", "count": "cluster_size"})
        )
        out = out.merge(reps, left_on="cluster", right_index=True, how="left")
        noise = out.cluster < 0
        out.loc[noise, "rep_vec_id"] = out.loc[noise, "vec_id"]
        out.loc[noise, "cluster_size"] = 1
        out["rep_vec_id"] = out["rep_vec_id"].astype("int64")
        out["cluster_size"] = out["cluster_size"].astype("int32")
        return out

    return withb.groupBy("bucket").applyInPandas(run, OUT_SCHEMA)
