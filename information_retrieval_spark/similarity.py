"""Similarity search over an embedding column (array<float>).

- `cosine_topk`        — brute-force exact top-k for one query vector:
  the dot product and norms are Spark higher-order `aggregate`
  expressions (JVM-side, no Python), a single scan + small top-k sort.
- `knn_join`           — exact k-NN for a set of query rows via
  broadcast crossJoin + per-query window top-k (baseline; quadratic).
- `lsh_bucket_topk`    — the scale path: random-hyperplane LSH. Each
  vector gets a `nbits`-bit signature (deterministic seeded planes,
  evaluated as a JVM-side SQL expression — bit-reproducible across
  Spark / DuckDB / Python, see signature_expr); candidates = rows
  within Hamming distance 1 of the query's bucket, then exact cosine
  re-rank inside candidates only. At 10^12 rows the persisted
  `build_signatures` table replaces per-query signature computation.
"""

from __future__ import annotations

import numpy as np
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


# --- bit-reproducible random-hyperplane signatures -------------------------
# The sign of a near-zero dot product depends on floating-point summation
# ORDER, so the signature is defined as an EXPLICIT left-associated chain
# of double multiply-adds: `(v[0]*p0 + v[1]*p1 + ...) > 0`. Spark SQL,
# DuckDB SQL and the pure-Python fold below all execute that exact IEEE-754
# operation sequence on the exact same doubles (float32 inputs widen
# exactly; plane literals are repr() round-trips), so all three engines
# produce the SAME signature for the same vector — which is what lets the
# approximate ANN operator have an exact DuckDB oracle.

def _dot_chain(plane, vec_col: str, one_based: bool) -> str:
    off = 1 if one_based else 0
    cast = "::DOUBLE" if one_based else ""
    if one_based:  # DuckDB dialect
        terms = [f"{vec_col}[{i + off}]{cast} * {float(p)!r}" for i, p in enumerate(plane)]
    else:          # Spark dialect ([] is 0-based; elements are float)
        terms = [f"CAST({vec_col}[{i}] AS DOUBLE) * {float(p)!r}" for i, p in enumerate(plane)]
    return "(" + " + ".join(terms) + ")"


def signature_expr(planes, vec_col: str = "embedding",
                   dialect: str = "spark") -> str:
    """SQL expression (Spark or DuckDB dialect) for the nbits-bit
    signature of a vector column under the given hyperplanes."""
    one_based = dialect == "duckdb"
    bits = [
        f"(CASE WHEN {_dot_chain(plane, vec_col, one_based)} > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    ]
    return "CAST(" + (" + ".join(bits)) + " AS BIGINT)"


def signature_of(vec, planes) -> int:
    """Pure-Python signature — the same left-to-right double fold as the
    SQL chains, so it agrees bit-for-bit with both engines."""
    sig = 0
    for b, plane in enumerate(planes):
        acc = 0.0
        for x, p in zip(vec, plane):
            acc = acc + float(x) * float(p)
        if acc > 0:
            sig |= 1 << b
    return sig


def build_signatures(df: DataFrame, nbits: int = 8, seed: int = 42,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id, sig): the build-time ANN signature table. Persist sorted by
    sig (`repartitionByRange('sig').sortWithinPartitions('sig')`) so a
    query's bucket probe prunes parquet row groups instead of scanning —
    at 10^12 rows signatures must be indexed once, never recomputed per
    query. All JVM-side codegen (no Python)."""
    dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, nbits, seed)
    return df.select(F.col(id_col).alias("id"),
                     F.expr(signature_expr(planes, vec_col)).alias("sig"))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              nbits: int = 8, seed: int = 42,
                              round_to: int = 6) -> DataFrame:
    """Near-duplicate pairs by embedding cosine: LSH-bucketed candidate
    generation chained into exact cosine verification on candidates only
    (the embedding analogue of dedup.near_duplicates — never the full
    O(n^2) cross join).

    Candidates = pairs whose nbits-bit hyperplane signatures are within
    Hamming distance 1 (each row probes its own bucket plus nbits
    single-bit flips); verification computes the exact cosine JVM-side.
    Signatures are bit-reproducible across engines (signature_expr), so
    the operator is deterministic and admits an exact DuckDB oracle.
    Recall < 1 by design: a pair at Hamming distance >= 2 is missed —
    at threshold 0.95 and 8 planes that probability is small and shrinks
    as nbits grows (standard multi-probe LSH trade-off).

    Returns (id_a, id_b, cos) with id_a < id_b, cos >= threshold.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, nbits, seed)
    sig = F.expr(signature_expr(planes, vec_col))
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     sig.alias("sig"))
    probes = F.explode(F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << b))
                        for b in range(nbits)])).alias("probe")
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                    F.col("sig").alias("sig_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                    "sig", probes)
    cand = (a.join(b, a["sig_a"] == b["probe"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
            .dropDuplicates(["id_a", "id_b"]))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * "
                 "cast(y as double)), cast(0.0 as double), (a, v) -> a + v)")
    na = F.greatest(F.expr(_norm_expr("va")), F.lit(1e-12))
    nb = F.greatest(F.expr(_norm_expr("vb")), F.lit(1e-12))
    return (cand.withColumn("cos_raw", dot / (na * nb))
            .filter(F.col("cos_raw") >= threshold)
            .select("id_a", "id_b", F.round("cos_raw", round_to).alias("cos")))


def lsh_bucket_topk(df: DataFrame, query_vec, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    nbits: int = 8, seed: int = 42,
                    round_to: int = 6,
                    signatures: DataFrame | None = None) -> DataFrame:
    """Approximate cosine top-k: exact re-rank restricted to the rows
    whose LSH signature is within Hamming distance 1 of the query's
    (multi-probe). Recall < 1 by design but fully DETERMINISTIC (see
    signature_expr), so it admits an exact cross-engine oracle.

    `signatures`: a persisted build_signatures table — the scale path.
    Without it the signature expression is evaluated inline over the
    corpus (one scan), which is the correct shape for a one-off query
    but recomputes per query; a standing deployment persists the table
    once (tests/test_ops.py exercises both paths)."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(len(q), nbits, seed)
    qsig = signature_of(q, planes)
    probe = [qsig] + [qsig ^ (1 << b) for b in range(nbits)]
    if signatures is not None:
        cand_ids = (signatures.filter(F.col("sig").isin(probe))
                    .select(F.col("id").alias(id_col)))
        cand = df.join(cand_ids, id_col)
    else:
        sig = F.expr(signature_expr(planes, vec_col))
        cand = df.withColumn("__sig", sig).filter(F.col("__sig").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col, round_to)
