"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (JVM-side higher-order
functions — no Python in the distance), and an IVF-style variant as the scale
path: k-means-ish centroid assignment via a deterministic seed sample, probe
the nearest n_probe centroids only.  Mirrors the kNN spatial design
(operators/knn.py): coarse prune -> exact refine -> rank window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(c) -> Column:
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _cosine_col(q_vec: str, c_vec: str, exact: bool) -> Column:
    """Cosine between two array columns.

    ``exact=True``: the sequential JVM fold (_dot/_norm) — the only form
    whose float accumulation order is bit-stable against a DuckDB
    list_dot_product oracle (round-2 finding); used by the gate queries.

    ``exact=False`` (production default): Arrow-batched numpy matmul in a
    pandas UDF.  Spark HOF lambdas are INTERPRETED per element (~1us/elem,
    plus a 10-20x cold-JVM cliff on fresh executors — CLAUDE.md rounds 2-3);
    at 100 TB every candidate pair pays that interpreter, so the refine path
    must be vectorized.  numpy's pairwise summation differs from the
    sequential fold only in the last ulp; ranking ties are already broken on
    the ROUNDED cosine + id."""
    if exact:
        # same degenerate-vector convention as the numpy path (which clamps
        # the denominator): zero-norm vectors get cosine 0.0, not NULL —
        # NULLs would sort differently under the rank window and break the
        # exact==production top-k invariant
        den = _norm(q_vec) * _norm(c_vec)
        return F.when(den > 0, _dot(q_vec, c_vec) / den).otherwise(F.lit(0.0))

    @F.pandas_udf("double")
    def cos(qs: pd.Series, cs: pd.Series) -> pd.Series:
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in qs])
        C = np.stack([np.asarray(v, dtype=np.float64) for v in cs])
        num = np.einsum("ij,ij->i", Q, C)
        den = np.linalg.norm(Q, axis=1) * np.linalg.norm(C, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    return cos(F.col(q_vec), F.col(c_vec))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "qvec",
    c_vec: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """Exact brute-force: broadcast queries x corpus, top-k with
    deterministic rounded-cosine + id tie-break.  ``exact`` selects the
    bit-stable JVM fold (gate oracles) vs the vectorized numpy refine
    (production) — see _cosine_col."""
    q = queries.select(q_id, q_vec)
    c = corpus.select(c_id, c_vec)
    sim = _cosine_col(q_vec, c_vec, exact)
    # rank on the ROUNDED cosine (+ id tie-break): the documented invariant
    # that makes exact=True and exact=False return identical top-k sets
    # (the paths differ only in sub-6dp accumulation noise)
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn("cosine", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )


def ivf_assign(corpus: DataFrame, centroids: np.ndarray, c_vec: str = "embedding") -> DataFrame:
    """Distributed nearest-centroid assignment (one pass).  float64 math with
    sims rounded to 6 decimals before the argmax (first-max tie-break) — the
    same decision an external SQL oracle makes from rounded dot products, so
    assignments are deterministic across engines and replicas."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = np.round(M @ cents.T, 6)
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return corpus.withColumn("list_id", assign(F.col(c_vec)))


def ivf_build(corpus: DataFrame, n_centroids: int = 16, c_vec: str = "embedding",
              c_id: str = "vec_id", iters: int = 5,
              centroids: np.ndarray | None = None) -> tuple[np.ndarray, DataFrame]:
    """Driver-side Lloyd iterations on a deterministic sample (ids hashed),
    then distributed assignment.  Returns (centroids, corpus+list_id).
    At 10^12 scale the sample stays driver-sized; assignment is one pass.
    Pass ``centroids`` to skip training and index against a fixed codebook."""
    if centroids is None:
        sample = (
            corpus.select(c_id, c_vec)
            .withColumn("h", F.pmod(F.xxhash64(F.col(c_id).cast("string")), F.lit(997)))
            .orderBy("h", c_id)
            .limit(max(n_centroids * 40, 512))
            .toPandas()
        )
        X = np.stack([np.asarray(v, dtype=np.float64) for v in sample[c_vec]])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        cent = X[:n_centroids].copy()
        for _ in range(iters):
            assign_idx = np.argmax(np.round(X @ cent.T, 6), axis=1)
            for j in range(n_centroids):
                m = X[assign_idx == j]
                if len(m):
                    v = m.mean(axis=0)
                    cent[j] = v / max(np.linalg.norm(v), 1e-12)
        centroids = cent
    centroids = np.asarray(centroids, dtype=np.float64)
    return centroids, ivf_assign(corpus, centroids, c_vec)


def ivf_topk(
    queries: DataFrame,
    indexed_corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    q_vec: str = "qvec",
    c_vec: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """ANN: probe the n_probe nearest centroid lists per query, cosine
    refine inside probed lists, top-k.  Approximate by construction (recall
    grows with n_probe); tests measure recall vs cosine_topk.  ``exact``
    selects the bit-stable JVM fold for gate oracles; production uses the
    vectorized numpy refine (_cosine_col)."""
    cents = centroids

    cents = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def probes(vs: pd.Series) -> pd.Series:
        M = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        # rounded sims + stable sort: first-index tie-break, matching an
        # ORDER BY round(sim,6) DESC, centroid_id ASC in an external oracle
        sims = np.round(M @ cents.T, 6)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(q_id, q_vec).withColumn("list_id", F.explode(probes(F.col(q_vec))))
    cand = q.join(indexed_corpus.select(c_id, c_vec, "list_id"), "list_id")
    sim = _cosine_col(q_vec, c_vec, exact)
    # rounded-cosine ranking: see cosine_topk
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(c_id).asc())
    return (
        cand.withColumn("cosine", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "cosine", "rank")
    )
