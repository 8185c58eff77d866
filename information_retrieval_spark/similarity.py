"""Similarity search over an embedding column (array<float>).

- `cosine_topk`        — brute-force exact top-k for one query vector:
  the dot product and norms are Spark higher-order `aggregate`
  expressions (JVM-side, no Python), a single scan + small top-k sort.
- `knn_join`           — exact k-NN for a set of query rows via
  broadcast crossJoin + per-query window top-k (baseline; quadratic).
- `lsh_bucket_topk`    — the scale path: random-hyperplane LSH. Each
  vector gets a `nbits`-bit signature (deterministic seeded planes,
  computed by a vectorized pandas UDF); candidates = rows sharing a
  signature bucket (optionally with multi-probe neighbors), then exact
  cosine re-rank inside buckets only. At 10^12 rows the bucket join
  replaces the full cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(vec_col: str, lit_vec: str) -> str:
    return (f"aggregate(zip_with({vec_col}, {lit_vec}, "
            f"(x, y) -> cast(x as double) * y), cast(0.0 as double), (a, v) -> a + v)")


def _norm_expr(vec_col: str) -> str:
    return (f"sqrt(aggregate({vec_col}, cast(0.0 as double), "
            f"(a, x) -> a + cast(x as double) * cast(x as double)))")


def _lit_array(vec) -> str:
    return "array(" + ", ".join(f"cast({float(x)!r} as double)" for x in vec) + ")"


def cosine_topk(df: DataFrame, query_vec, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6) -> DataFrame:
    """Exact cosine top-k of one query vector: (id, cos) desc, id asc."""
    q = _lit_array(query_vec)
    qn = float(np.sqrt(np.dot(np.asarray(query_vec, dtype=np.float64),
                              np.asarray(query_vec, dtype=np.float64)))) or 1.0
    # zero-norm guard: 0/0 would be NaN, and Spark sorts NaN ABOVE any
    # double — a zero vector would otherwise rank first (and diverge from
    # the DuckDB oracle). greatest(norm, eps) pins zero vectors to cos 0.
    row_norm = F.greatest(F.expr(_norm_expr(vec_col)), F.lit(1e-12))
    cos = F.expr(_dot_expr(vec_col, q)) / (row_norm * F.lit(qn))
    return (df.select(F.col(id_col).alias("id"), cos.alias("cos_raw"))
            .orderBy(F.desc("cos_raw"), F.asc("id")).limit(k)
            .select("id", F.round("cos_raw", round_to).alias("cos")))


def knn_join(df: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact k-NN: every query row joined to its k nearest corpus rows.
    queries: (qid, qvec). Broadcast the (small) query side."""
    from pyspark.sql import Window
    dot = F.expr(_dot_expr(vec_col, "qvec"))
    # same zero-norm guard as cosine_topk
    norms = F.greatest(F.expr(_norm_expr(vec_col)) * F.expr(_norm_expr("qvec")),
                       F.lit(1e-12))
    scored = (df.crossJoin(F.broadcast(queries))
              .select("qid", F.col(id_col).alias("id"), (dot / norms).alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _planes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float64)


def signature_udf(dim: int, nbits: int = 16, seed: int = 42):
    planes = _planes(dim, nbits, seed)
    weights = (1 << np.arange(nbits)).astype(np.int64)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        if vecs.empty:
            return pd.Series([], dtype="int64")
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes.T) > 0
        return pd.Series(bits @ weights)

    return _sig


def lsh_bucket_topk(df: DataFrame, query_vec, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, seed: int = 42,
                    round_to: int = 6) -> DataFrame:
    """Approximate cosine top-k: exact re-rank restricted to the rows
    whose LSH signature is within Hamming distance 1 of the query's
    (multi-probe). Recall < 1 by design; the brute-force operator is
    the truth baseline."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(len(q), nbits, seed)
    qsig = int(((planes @ q) > 0) @ (1 << np.arange(nbits)).astype(np.int64))
    probe = [qsig] + [qsig ^ (1 << b) for b in range(nbits)]
    sig = signature_udf(len(q), nbits, seed)
    bucketed = df.withColumn("__sig", sig(F.col(vec_col)))
    cand = bucketed.filter(F.col("__sig").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col, round_to)
