"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
(or a §2.3 / training-data-pipeline addition); each ``oracle_sql()``
entry reproduces the exact same semantics in DuckDB SQL over the raw
parquet tables — including the full tokenizer pipeline
(normalize.duckdb_tokens_expr mirrors the engine's tokenizer
regex-for-regex). Column names and types are aligned on both sides.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from information_retrieval_spark import (bpe, codesearch, dedup, sampling,
                                          similarity, textstats)
from information_retrieval_spark.build import (
    INDEX_FORMAT_VERSION,
    IndexBuilder,
    IndexConfig,
)
from information_retrieval_spark.corpus import load_testdata_documents
from information_retrieval_spark.normalize import duckdb_tokens_expr
from information_retrieval_spark.query import QueryEngine

_ENGINES: dict = {}

# DuckDB tokenizer CTE shared by every oracle query
_T = duckdb_tokens_expr("text")
_TOKS = f"toks AS (SELECT doc_id, {_T} AS t FROM documents)"
_EX = "ex AS (SELECT doc_id, unnest(t) AS term FROM toks)"
_POS = "pos AS (SELECT doc_id, unnest(t) AS term, unnest(range(len(t))) AS p FROM toks)"


def _bpe_train_ctes(n: int, final_seg: bool = False) -> str:
    """Unrolled-CTE replay of bpe.train's `n` merge iterations.
    `final_seg` also applies the LAST merge, yielding seg{n+1} — the
    fully-encoded segmentation the encode oracle aggregates (train
    itself never needs it).

    w0 = the word-frequency dictionary; seg{r} = (word, freq, pos, sym)
    the segmentation entering iteration r; b{r} = iteration r's winning
    pair under the pinned (count desc, left, right) order; k{r} = the
    GREEDY LEFTMOST non-overlapping merge sites (consecutive hit runs
    keep odd ranks — overlaps only arise when left==right, and the
    paper's regex-replace keeps the 1st/3rd/... of a run); seg{r+1}
    drops each kept site's right half and renumbers. MATERIALIZED is
    load-bearing: DuckDB CTEs inline by default and each level
    references its predecessor several times — unmaterialized, the
    chain re-evaluates exponentially."""
    ws = r"[ \t\n\x0b\f\r]+"
    ctes = [f"""w0 AS MATERIALIZED (
            SELECT word, COUNT(*)::BIGINT AS freq FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(coalesce(text, ''), '{ws}'),
                    x -> x != '')) AS word
                FROM documents) GROUP BY word
        )""", """seg1 AS MATERIALIZED (
            SELECT word, freq, pos::BIGINT AS pos, word[pos] AS sym FROM (
                SELECT word, freq,
                       unnest(generate_series(1, length(word))) AS pos
                FROM w0)
        )"""]
    for r in range(1, n + 1):
        ctes.append(f"""b{r} AS MATERIALIZED (
            SELECT l AS "left", r2 AS "right", SUM(freq)::BIGINT AS cnt
            FROM (SELECT sym AS l,
                         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r2,
                         freq
                  FROM seg{r})
            WHERE r2 IS NOT NULL GROUP BY 1, 2
            ORDER BY cnt DESC, "left", "right" LIMIT 1
        )""")
        if r < n or final_seg:
            ctes.append(f"""k{r} AS MATERIALIZED (
            SELECT word, pos FROM (
                SELECT word, pos,
                       ROW_NUMBER() OVER (PARTITION BY word, grp
                                          ORDER BY pos) AS rn
                FROM (SELECT word, pos,
                             pos - ROW_NUMBER() OVER (PARTITION BY word
                                                      ORDER BY pos) AS grp
                      FROM (SELECT word, pos, sym,
                                   (sym = b."left" AND
                                    lead(sym) OVER (PARTITION BY word
                                                    ORDER BY pos)
                                        = b."right") AS hit
                            FROM seg{r}, b{r} b)
                      WHERE hit)
            ) WHERE rn % 2 = 1
        )""")
            ctes.append(f"""seg{r + 1} AS MATERIALIZED (
            SELECT s.word, s.freq,
                   ROW_NUMBER() OVER (PARTITION BY s.word
                                      ORDER BY s.pos)::BIGINT AS pos,
                   CASE WHEN k.pos IS NOT NULL THEN s.sym || b."right"
                        ELSE s.sym END AS sym
            FROM seg{r} s
            CROSS JOIN b{r} b
            LEFT JOIN k{r} k  ON k.word = s.word AND k.pos = s.pos
            LEFT JOIN k{r} k2 ON k2.word = s.word AND k2.pos = s.pos - 1
            WHERE k2.pos IS NULL
        )""")
    return ",\n        ".join(ctes)


def _bm25_ctes() -> str:
    """tf/dl/st/dfreq/scores CTEs: exact BM25 (k1=1.2, b=0.75) for the
    fixed gate query ('spark join window'), shared by the bm25_topk and
    bm25_snippets oracles."""
    return """
        tf AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)
            WHERE term IN ('spark', 'join', 'window')
            GROUP BY doc_id, term
        ),
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf
            JOIN dfreq USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN st
            GROUP BY tf.doc_id
        )"""


_BM25_BATCH = {
    # batched-BM25 gate queries; term lists below must be the normalized
    # forms (all are stem-chain no-ops: none end in the s/g/d guard chars)
    "q_spark": "spark join window",
    "q_merge": "table merge",
    "q_sort": "sort spark window",
}
_BM25_BATCH_TERMS = {
    "q_spark": ("spark", "join", "window"),
    "q_merge": ("table", "merge"),
    "q_sort": ("sort", "spark", "window"),
}


def _bm25_scores_cte(terms, tag: str) -> str:
    """Parameterized exact-BM25 CTE chain (tf{tag}/dfreq{tag}/
    scores{tag}) over shared toks/dl/st — the per-query oracle the
    batched bm25_batch gate unions."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        tf{tag} AS (
            SELECT doc_id, term, count(*)::DOUBLE AS tf
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)
            WHERE term IN ({in_list})
            GROUP BY doc_id, term
        ),
        dfreq{tag} AS (SELECT term, count(*)::DOUBLE AS df
                       FROM tf{tag} GROUP BY term),
        scores{tag} AS (
            SELECT tf{tag}.doc_id,
                   sum(ln(1 + (st.n - dfreq{tag}.df + 0.5) / (dfreq{tag}.df + 0.5))
                       * tf{tag}.tf * (1.2 + 1.0)
                       / (tf{tag}.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf{tag}
            JOIN dfreq{tag} USING (term)
            JOIN dl USING (doc_id)
            CROSS JOIN st
            GROUP BY tf{tag}.doc_id
        )"""


def _minhash_lsh_ctes(num_hashes: int, band_size: int, n: int) -> str:
    """CTEs sh/hv/mins/banded/cand reproducing dedup.minhash_lsh_pairs
    over n-gram shingle features with the universal-hash minhash family:
    h32 = first 8 hex chars of sha256(feature) as an int, permutation i
    = (a_i*h32 + b_i) mod p — exact BIGINT arithmetic, identical in
    both engines."""
    from information_retrieval_spark.dedup import MINHASH_P, minhash_coeffs

    h32 = " + ".join(
        f"(strpos('0123456789abcdef', substr(sha256(feature), {k + 1}, 1)) - 1) "
        f"* {16 ** (7 - k)}" for k in range(8))
    coeffs = minhash_coeffs(num_hashes)
    mins = ", ".join(
        f"min(({a}::BIGINT * h + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(coeffs))
    n_bands = num_hashes // band_size
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        + " || ':' || ".join(f"m{b * band_size + j}::VARCHAR"
                             for j in range(band_size))
        + " AS band_key FROM mins"
        for b in range(n_bands))
    return f"""
        sh AS (
            SELECT doc_id AS id, unnest(
                list_distinct(list_transform(range(greatest(len(t) - {n}, -1) + 1),
                              i -> array_to_string(list_slice(t, i + 1, i + {n}), ' ')))
            ) AS feature
            FROM toks
        ),
        hv AS (SELECT id, ({h32})::BIGINT AS h FROM sh),
        mins AS (SELECT id, {mins} FROM hv GROUP BY id),
        banded AS ({band_rows}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM banded a JOIN banded b USING (band, band_key)
            WHERE a.id < b.id
        )"""


def _ivf_af_ctes(n_lists: int, iters: int, dim: int,
                 train_rate: float | None,
                 train_seed: str = "ivf-train"):
    """The shared IVF oracle prefix: CTE chain re-deriving the
    deterministic quantized-k-means centroids (exact int64 sums;
    left-associated float64 distance folds identical to
    similarity._ivf_dists) and the final FULL-CORPUS assignments `af`
    — iterations unrolled as chained CTEs. With ``train_rate``, the
    training CTEs (init + every iteration) read the SAME deterministic
    hash sample the Spark side trains on (sampling.uniform_expr keyed
    by vec_id); the final assignment still covers every vector.
    Returns (ctes, final_centroid_cte_name, dist_fn) so the
    ann_ivf_topk and ann_semdedup_pairs oracles can append their own
    query-specific CTEs."""
    from information_retrieval_spark.sampling import uniform_expr
    from information_retrieval_spark.similarity import ivf_quantize_expr

    def dist(iv: str, c: str) -> str:
        terms = [
            f"(CAST({iv}[{i + 1}] AS DOUBLE) - {c}[{i + 1}])"
            f" * (CAST({iv}[{i + 1}] AS DOUBLE) - {c}[{i + 1}])"
            for i in range(dim)]
        return "(" + " + ".join(terms) + ")"

    sums = ", ".join(f"sum(iv[{i + 1}])::BIGINT AS s{i}" for i in range(dim))
    newc = ", ".join(f"CAST(s{i} AS DOUBLE) / cnt" for i in range(dim))
    qz = ivf_quantize_expr("embedding", "duckdb")
    ctes = [
        f"ivq AS (SELECT vec_id, {qz} AS iv FROM embeddings)",
    ]
    if train_rate is not None:
        u = uniform_expr("vec_id", train_seed, dialect="duckdb")
        ctes.append(
            f"ivqt AS (SELECT vec_id, iv FROM ivq WHERE {u} < {train_rate!r})")
        train_src = "ivqt"
    else:
        train_src = "ivq"
    ctes.append(
        f"""c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
                   list_transform(iv, x -> CAST(x AS DOUBLE)) AS c
            FROM (SELECT * FROM {train_src} ORDER BY vec_id LIMIT {n_lists}))""")
    prev = "c0"
    for t in range(1, iters + 1):
        ctes += [
            f"""d{t} AS (SELECT v.vec_id, c.list_id,
                {dist('v.iv', 'c.c')} AS dist
                FROM {train_src} v CROSS JOIN {prev} c)""",
            f"""a{t} AS (SELECT vec_id, list_id FROM (
                SELECT vec_id, list_id, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, list_id) AS rn
                FROM d{t}) WHERE rn = 1)""",
            f"""s{t} AS (SELECT list_id, count(*)::BIGINT AS cnt, {sums}
                FROM a{t} JOIN {train_src} USING (vec_id) GROUP BY list_id)""",
            f"""c{t} AS (SELECT p.list_id,
                CASE WHEN s.cnt IS NULL THEN p.c ELSE [{newc}] END AS c
                FROM {prev} p LEFT JOIN s{t} s USING (list_id))""",
        ]
        prev = f"c{t}"
    ctes += [
        # final assignment under the trained centroids
        f"""df_ AS (SELECT v.vec_id, c.list_id, {dist('v.iv', 'c.c')} AS dist
            FROM ivq v CROSS JOIN {prev} c)""",
        """af AS (SELECT vec_id, list_id FROM (
            SELECT vec_id, list_id, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, list_id) AS rn
            FROM df_) WHERE rn = 1)""",
    ]
    return ctes, prev, dist


def _ivf_oracle_sql(n_lists: int = 8, iters: int = 2, nprobe: int = 2,
                    k: int = 10, dim: int = 64,
                    train_rate: float | None = None,
                    train_seed: str = "ivf-train") -> str:
    """DuckDB oracle for ann_ivf_topk: the shared centroid/assignment
    chain (_ivf_af_ctes), then the query's nprobe lists and the exact
    cosine re-rank."""
    from information_retrieval_spark.similarity import ivf_quantize_expr

    ctes, prev, dist = _ivf_af_ctes(n_lists, iters, dim,
                                    train_rate, train_seed)
    qz = ivf_quantize_expr("embedding", "duckdb")
    ctes += [
        f"""q AS (SELECT embedding AS qv, {qz} AS qiv
            FROM embeddings WHERE vec_id = 0)""",
        f"""qd AS (SELECT c.list_id, {dist('q.qiv', 'c.c')} AS dist
            FROM q CROSS JOIN {prev} c)""",
        f"pr AS (SELECT list_id FROM qd ORDER BY dist, list_id LIMIT {nprobe})",
        """cand AS (SELECT e.vec_id, e.embedding
            FROM embeddings e JOIN af USING (vec_id) JOIN pr USING (list_id))""",
        """sc AS (SELECT vec_id,
            list_sum(list_transform(range(len(embedding)),
                     i -> embedding[i + 1]::DOUBLE * qv[i + 1]::DOUBLE))
            / (greatest(sqrt(list_sum(list_transform(embedding,
                             x -> x::DOUBLE * x::DOUBLE))), 1e-12)
               * sqrt(list_sum(list_transform(qv,
                               x -> x::DOUBLE * x::DOUBLE)))) AS c
            FROM cand CROSS JOIN q)""",
    ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vec_id, round(c, 6) AS cos FROM sc "
              f"ORDER BY c DESC, vec_id LIMIT {k}")


def _semdedup_oracle_sql(n_lists: int = 8, iters: int = 2, dim: int = 64,
                         threshold: float = 0.4,
                         train_rate: float | None = None,
                         train_seed: str = "ivf-train") -> str:
    """DuckDB oracle for ann_semdedup_pairs: the shared
    centroid/assignment chain (_ivf_af_ctes), then ALL within-cluster
    pairs with their exact cosine — the oracle makes the operator's
    recall contract explicit: pairs it returns are exactly
    {(a, b) : list(a) == list(b) and cos(a, b) >= threshold}."""
    ctes, _, _ = _ivf_af_ctes(n_lists, iters, dim, train_rate, train_seed)
    ctes += [
        """prs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM af a JOIN af b
            ON a.list_id = b.list_id AND a.vec_id < b.vec_id)""",
        """pv AS (SELECT id_a, id_b, ea.embedding AS va, eb.embedding AS vb
            FROM prs
            JOIN embeddings ea ON ea.vec_id = id_a
            JOIN embeddings eb ON eb.vec_id = id_b)""",
        """sc AS (SELECT id_a, id_b,
            list_sum(list_transform(range(len(va)),
                     i -> va[i + 1]::DOUBLE * vb[i + 1]::DOUBLE))
            / (greatest(sqrt(list_sum(list_transform(va,
                             x -> x::DOUBLE * x::DOUBLE))), 1e-12)
               * greatest(sqrt(list_sum(list_transform(vb,
                               x -> x::DOUBLE * x::DOUBLE))), 1e-12)) AS c
            FROM pv)""",
    ]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id_a, id_b, round(c, 6) AS cos FROM sc "
              f"WHERE c >= {threshold!r}")


def _engine(spark: SparkSession, sf_dir: str) -> QueryEngine:
    """Build (or reuse) the inverted index for a testdata scale factor."""
    key = os.path.abspath(sf_dir)
    if key not in _ENGINES:
        tag = key.strip("/").replace("/", "_")
        index_dir = os.path.join(
            tempfile.gettempdir(), f"irs_index_v{INDEX_FORMAT_VERSION}_{tag}")
        docs = load_testdata_documents(spark, sf_dir)
        idx = IndexBuilder(spark, index_dir, IndexConfig()).build(docs, resume=True)
        _ENGINES[key] = QueryEngine(idx)
    return _ENGINES[key]


def _docs_to_doc_id(engine: QueryEngine, docs_df: DataFrame) -> DataFrame:
    """Engine docIDs -> original doc_id (corpus mapping: path=str(doc_id))."""
    dm = engine.index.table("doc_map").select("docID", F.col("path").cast("long").alias("doc_id"))
    return docs_df.join(dm, "docID").select("doc_id").orderBy("doc_id")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _query_vec(spark: SparkSession, sf_dir: str):
    row = _embeddings(spark, sf_dir).filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 with block-max WAND on sf0.001."""
    qe = _engine(spark, "/root/testdata/sf0.001")
    top = qe.bm25("spark join window", k=10, wand=True)
    dm = qe.index.table("doc_map").select(
        "docID", F.col("path").cast("long").alias("doc_id"))
    return (top.join(dm, "docID")
            .select("doc_id", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- index build outputs (SURVEY §2.1 B1-B16) ----
    def term_stats(spark, sf):
        d = _engine(spark, sf).index.table("dictionary")
        return d.select("term", F.col("df").cast("long").alias("df"),
                        F.col("cf").cast("long").alias("cf"))
    q["term_stats"] = term_stats

    def doc_lengths(spark, sf):
        # doc_len stores only docs with >=1 kept term; docs absent from it
        # have dl = 0 (left join + coalesce reconstructs the full relation)
        e = _engine(spark, sf)
        dm = e.index.table("doc_map").select("docID", F.col("path").cast("long").alias("doc_id"))
        return (dm.join(e.index.table("doc_len"), "docID", "left")
                .select("doc_id",
                        F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl")))
    q["doc_lengths"] = doc_lengths

    def term_ordinals(spark, sf):
        # Q16 getTermDictPos (IndexBody.java:86-88): ordinal of each term
        # in the sorted dictionary, precomputed at build time
        d = _engine(spark, sf).index.table("dictionary")
        return d.select("term", F.col("term_ord").cast("long").alias("term_ord"))
    q["term_ordinals"] = term_ordinals

    # ---- dictionary range scans (Q3 prefix / Q4 suffix via rterm) ----
    def dict_prefix_terms(spark, sf):
        d = _engine(spark, sf).index.table("dictionary")
        return (d.filter(F.col("term").startswith("s"))
                .select("term", F.col("df").cast("long").alias("df")))
    q["dict_prefix_terms"] = dict_prefix_terms

    def dict_suffix_terms(spark, sf):
        # suffix match through the reversed-term column (IndexBody.java:40-53)
        d = _engine(spark, sf).index.table("dictionary")
        return (d.filter(F.col("rterm").startswith("wo"))  # terms ending in "ow"
                .select("term", F.col("df").cast("long").alias("df")))
    q["dict_suffix_terms"] = dict_suffix_terms

    def dict_fuzzy_terms(spark, sf):
        # fuzzy vocabulary match (north-star "did you mean"): one
        # metadata-sized dictionary scan, length-banded + JVM banded
        # levenshtein — postings never touched
        e = _engine(spark, sf)
        return (e.fuzzy_terms("part", max_edits=2)
                .select("term", F.col("df").cast("long").alias("df"),
                        F.col("dist").cast("int").alias("dist")))
    q["dict_fuzzy_terms"] = dict_fuzzy_terms

    def dict_fuzzy_suggest(spark, sf):
        # ranked top-k corrections: dist asc, df desc, term — the exact
        # deterministic cut (dist dominates df: 'row' outranks the
        # higher-df 'join' here)
        e = _engine(spark, sf)
        return (e.suggest("ron", k=2, max_edits=2)
                .select("term", F.col("df").cast("long").alias("df"),
                        F.col("dist").cast("int").alias("dist")))
    q["dict_fuzzy_suggest"] = dict_fuzzy_suggest

    # ---- boolean retrieval (SURVEY §2.2 Q6-Q10) ----
    def boolean_and(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(e, e.boolean_docs("spark AND join"))
    q["boolean_and"] = boolean_and

    def boolean_or_not(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(
            e, e.boolean_docs("table AND NOT merge OR spark AND window"))
    q["boolean_or_not"] = boolean_or_not

    # ---- positional retrieval (Q11-Q12) ----
    def positional_within(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(e, e.positional_docs("spark /3 join"))
    q["positional_within"] = positional_within

    def phrase_exact(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(e, e.phrase_docs("row column sort"))
    q["phrase_exact"] = phrase_exact

    # ---- joker / wildcard (Q3, Q4, Q13) ----
    def joker_prefix_suffix(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(e, e.joker_docs("st* *ow"))
    q["joker_prefix_suffix"] = joker_prefix_suffix

    def joker_middle(spark, sf):
        e = _engine(spark, sf)
        return _docs_to_doc_id(e, e.joker_docs("s*a*"))
    q["joker_middle"] = joker_middle

    # ---- BM25 top-k (§2.3) ----
    def bm25_topk(spark, sf):
        e = _engine(spark, sf)
        top = e.bm25("spark join window", k=10, wand=True)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["bm25_topk"] = bm25_topk

    def bm25_boosted(spark, sf):
        # query-time term weighting (the search-box `term^2` operator):
        # per-term idf multipliers thread through the SAME map the
        # scoring kernel and the WAND bounds consume, so pruning stays
        # exact under boosts
        e = _engine(spark, sf)
        top = e.bm25_boosted({"spark": 2.0, "join": 1.0, "window": 0.5},
                             k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["bm25_boosted"] = bm25_boosted

    def bm25_proximity(spark, sf):
        # proximity-boosted rerank of the top-25 pool: minimal covering
        # window (the snippets primitive) turns into a
        # (n_terms-1)/window_len bonus; rounded before the cut
        e = _engine(spark, sf)
        top = e.bm25_proximity("spark join window", k=10, pool=25)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return top.join(dm, "docID").select("doc_id", "score")
    q["bm25_proximity"] = bm25_proximity

    def search_corrected(spark, sf):
        # did-you-mean pipeline end to end: misspelled tokens resolve to
        # their top dictionary correction (ONE banded dictionary scan
        # for the whole token batch, suggest()'s deterministic cut),
        # then the corrected term set runs the standard BM25 kernel
        e = _engine(spark, sf)
        top = e.search_corrected("sparkk joinn window", k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["search_corrected"] = search_corrected

    def qlm_topk(spark, sf):
        # Dirichlet query-likelihood ranking (Zhai & Lafferty 2001) over
        # the same inverted index: kernel scores vs the oracle's full
        # relational recomputation from raw documents
        e = _engine(spark, sf)
        top = e.qlm("spark join window", k=10, mu=2000.0)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["qlm_topk"] = qlm_topk

    def bm25_snippets(spark, sf):
        # top-k page + minimal covering snippet window from the
        # positional index (two-pointer Arrow sweep vs the oracle's
        # O(occ^2) relational window — algorithm-diverse equality)
        e = _engine(spark, sf)
        top = e.bm25_snippets("spark join window", k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score"),
                        "win_start", "win_end", "n_terms"))
    q["bm25_snippets"] = bm25_snippets

    def bm25_batch(spark, sf):
        # batched multi-query BM25: three queries, ONE union-term block
        # scan + ONE kernel pass (QueryEngine.bm25_many); the oracle
        # recomputes each query's exact BM25 top-k independently
        e = _engine(spark, sf)
        top = e.bm25_many(_BM25_BATCH, k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("qid", "doc_id", F.round("score", 6).alias("score")))
    q["bm25_batch"] = bm25_batch

    # ---- dedup suite ----
    def dedup_exact(spark, sf):
        return dedup.exact_duplicates(_documents(spark, sf))
    q["dedup_exact"] = dedup_exact

    def dedup_ngram_jaccard_lsh(spark, sf):
        # candidate-DRIVEN exact verification (the scale shape): the
        # shared-shingle self-join is never formed over the corpus —
        # LSH band collisions propose pairs, exact Jaccard verifies,
        # and one persisted shingle relation feeds both stages.
        # Bands of 2 keep candidate recall meaningful at the op's own
        # threshold (J=0.3 collides in >=1 of 8 bands w.p. ~0.53,
        # J=0.5 ~0.90, true dups ~1.0). The `_lsh` suffix makes the
        # recall<1 contract explicit in the graded surface (ADVICE r3):
        # a true pair slightly above threshold that no band captures is
        # absent on BOTH sides by design; the exact all-pairs operator
        # (dedup.ngram_jaccard_pairs without candidates=) remains
        # available standalone for small inputs.
        return dedup.near_duplicates(_documents(spark, sf), n=2,
                                     threshold=0.3, num_hashes=16,
                                     band_size=2)
    q["dedup_ngram_jaccard_lsh"] = dedup_ngram_jaccard_lsh

    def dedup_minhash_lsh(spark, sf):
        # DISCRIMINATIVE parameters: 3-gram shingle features, 4 bands of 4
        # (term features with tiny bands made the round-1 gate degenerate:
        # 79% of all pairs were candidates)
        return dedup.minhash_lsh_pairs(_documents(spark, sf),
                                       num_hashes=16, band_size=4, n=3)
    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_near(spark, sf):
        # the scale pipeline: LSH candidates -> exact Jaccard verify on
        # candidates only
        return dedup.near_duplicates(_documents(spark, sf), n=3,
                                     threshold=0.8, num_hashes=64, band_size=8)
    q["dedup_near"] = dedup_near

    def dedup_simhash(spark, sf):
        return dedup.simhash_signatures(_documents(spark, sf))
    q["dedup_simhash"] = dedup_simhash

    def dedup_simhash_pairs(spark, sf):
        # block-banded Hamming<=k pairing: max_hamming+1 signature
        # blocks, pigeonhole makes the block-equality join a COMPLETE
        # candidate cover (recall exactly 1.0); hot buckets above the
        # default bucket_cap re-band on a second pigeonhole split of
        # the block's complement bits (skew defense — still complete);
        # exact Hamming verify on candidates only — gated against an
        # ALL-PAIRS oracle, so the hash compare is an empirical
        # completeness proof of the banding INCLUDING the sub-split
        return dedup.simhash_near_duplicates(_documents(spark, sf),
                                             max_hamming=6)
    q["dedup_simhash_pairs"] = dedup_simhash_pairs

    def dedup_contamination(spark, sf):
        # benchmark decontamination: a ~4% hash split plays the eval
        # set; its shingles BROADCAST into one map-side join against
        # the corpus shingle scan (no corpus shuffle until the overlap
        # counts) — containment catches eval items embedded in larger
        # docs where symmetric Jaccard stays tiny
        docs = _documents(spark, sf)
        u = F.expr(sampling.uniform_expr("doc_id", "contam"))
        return dedup.contamination(docs.filter(u < 0.96),
                                   docs.filter(u >= 0.96),
                                   n=3, min_overlap=2)
    q["dedup_contamination"] = dedup_contamination

    def dedup_spans(spark, sf):
        # exact duplicated spans (Lee et al. 2022): maximal token runs
        # covered by 8-token grams repeated verbatim across >= 2 docs —
        # the exact-substring dedup family (cut the span, not the doc)
        return dedup.duplicated_spans(_documents(spark, sf), k=8)
    q["dedup_spans"] = dedup_spans

    def dedup_span_stats(spark, sf):
        # per-doc duplicated-coverage fraction under the same spans —
        # the threshold number a curation pipeline filters on
        return dedup.span_duplication_stats(_documents(spark, sf), k=8)
    q["dedup_span_stats"] = dedup_span_stats

    def dedup_span_cut(spark, sf):
        # the actionable output: every duplicated span cut out of the
        # corpus (kept tokens rejoined; whitespace canonicalized)
        return dedup.cut_duplicated_spans(_documents(spark, sf), k=8)
    q["dedup_span_cut"] = dedup_span_cut

    def sample_token_mix(spark, sf):
        # data mixing: per-stratum token budgets filled by a
        # deterministic hash-ordered greedy prefix (the mixture-weights
        # step of corpus assembly); fr's budget exceeds its supply, so
        # that stratum keeps everything (the unfillable edge)
        return sampling.token_budget_mix(
            _documents(spark, sf), {"en": 5000, "de": 1500, "fr": 4000})
    q["sample_token_mix"] = sample_token_mix

    def pipeline_curate(spark, sf):
        # the END-TO-END curation pipeline as one relation — the audit
        # table that says where every token went: curation gate
        # (language/length/quality/repetition, first-fail reason) ->
        # exact-span surgery ON THE SURVIVORS -> per-doc tokens
        # in/out. Pure composition of three already-gated operators.
        docs = _documents(spark, sf)
        cur = textstats.curation_report(
            docs, lang="en", min_tokens=30, min_quality=0.7,
            max_dup_line=0.2, max_dup_ngram=0.05)
        kept_ids = cur.filter("kept").select(F.col("id").alias("doc_id"))
        # materialize the gate's survivors before span surgery — the
        # span stage derives its gram relation twice and would re-run
        # the curation projection per derivation (at scale the gate
        # output is persisted between stages; localCheckpoint is that
        # practice at test scale)
        kept_docs = docs.join(kept_ids, "doc_id").localCheckpoint(eager=True)
        cut = dedup.cut_duplicated_spans(kept_docs, k=8)
        return (cur.join(cut.select("id", "n_kept_tokens"), "id", "left")
                .select("id", F.col("reason").alias("stage_reason"),
                        F.col("n_ws_tokens").alias("n_tokens_in"),
                        F.coalesce("n_kept_tokens", F.lit(0)).cast("long")
                        .alias("n_tokens_out")))
    q["pipeline_curate"] = pipeline_curate

    def dedup_incremental(spark, sf):
        # incremental ingestion dedup (streaming/dedup.py): the
        # corpus-so-far — a deterministic 80% hash split — lives in a
        # persisted banded-signature store; the remaining 20% arrives
        # as a new batch and is probed against store + itself. Returns
        # (id_a, id_b, est_jaccard) candidate pairs with >=1 new-side
        # member; est_jaccard = fraction of agreeing minhash slots
        # (the scale-honest verification currency — exact shingle
        # Jaccard would need every historical shingle set kept hot).
        # Per-batch cost is O(batch + matched buckets): the new side
        # broadcasts, its band keys push into the store scan.
        from information_retrieval_spark.streaming.dedup import (
            IncrementalDeduper,
        )
        docs = _documents(spark, sf)
        u = F.expr(sampling.uniform_expr("doc_id", "inc-dd"))
        tag = os.path.abspath(sf).strip("/").replace("/", "_")
        store = os.path.join(tempfile.gettempdir(),
                             f"irs_dedup_store_v1_{tag}")
        dd = IncrementalDeduper(spark, store, num_hashes=16,
                                band_size=4, n=3)
        dd.append(docs.filter(u < 0.8), 0)  # idempotent (marker)
        return dd.probe(docs.filter(u >= 0.8))
    q["dedup_incremental"] = dedup_incremental

    # ---- text analysis suite ----
    def text_token_counts(spark, sf):
        return textstats.token_counts(_documents(spark, sf)).select(
            "id", F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("n_distinct_terms").cast("long").alias("n_distinct_terms"),
            F.col("n_chars").cast("long").alias("n_chars"))
    q["text_token_counts"] = text_token_counts

    def text_language_id(spark, sf):
        return textstats.language_id(_documents(spark, sf))
    q["text_language_id"] = text_language_id

    def text_quality_scores(spark, sf):
        return textstats.quality_scores(_documents(spark, sf))
    q["text_quality_scores"] = text_quality_scores

    def curation_top_quality(spark, sf):
        # the selection step after quality scoring: keep the best 30%
        # of every language by quality (rank and group count share ONE
        # group-keyed exchange; ceil(frac*count) is the same float64
        # product+ceil in every engine; ties break on id)
        d = _documents(spark, sf)
        scored = (textstats.quality_scores(d)
                  .join(d.select(F.col("doc_id").alias("id"), "lang"),
                        "id"))
        kept = sampling.top_fraction_per_group(
            scored, 0.3, "lang", "quality", id_col="id")
        return kept.select(F.col("id").cast("long").alias("doc_id"),
                           "lang", "quality")
    q["curation_top_quality"] = curation_top_quality

    def text_repetition(spark, sf):
        # Gopher-style within-doc repetition quality filters: duplicate
        # non-blank-line fraction + duplicate kept-term 3-gram fraction
        return textstats.repetition_scores(_documents(spark, sf))
    q["text_repetition"] = text_repetition

    def text_fingerprints(spark, sf):
        return textstats.doc_fingerprints(_documents(spark, sf), n=5)
    q["text_fingerprints"] = text_fingerprints

    def text_unigram_logprob(spark, sf):
        # corpus-relative importance signal: mean ln p(term) under the
        # corpus's own MLE unigram LM (doc-distinct term counts join
        # the cf relation derived from the same counts — no UDF)
        return textstats.unigram_logprob_scores(_documents(spark, sf))
    q["text_unigram_logprob"] = text_unigram_logprob

    def text_pii(spark, sf):
        # PII detect + redact (the C4/RefinedWeb curation step). The
        # synthetic corpus contains no PII-shaped spans, so the gate
        # plants them DETERMINISTICALLY from the doc's own fields (an
        # email built from `source`, an IP from doc_id, plus a decoy
        # "1234.5.6.7" that must NOT match) — the same augmentation
        # expression runs in the oracle, so counts and the redacted
        # text verify character-for-character across engines.
        d = _documents(spark, sf)
        aug = d.select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" mail "), F.col("source"),
                     F.lit("@corp.example.com node 10.1."),
                     (F.col("doc_id") % 200).cast("string"),
                     F.lit(".42 decoy 1234.5.6.7")).alias("text"))
        return (textstats.pii_stats(aug)
                .join(textstats.redact_pii(aug), "id"))
    q["text_pii"] = text_pii

    def text_bpe_pieces(spark, sf):
        # GPT-2-style pre-tokenizer piece counts — the LLM token-budget
        # estimate next to whitespace counts (BPE merges only ever
        # happen within pre-tokenizer pieces)
        return textstats.bpe_piece_counts(_documents(spark, sf))
    q["text_bpe_pieces"] = text_bpe_pieces

    def curation_report(spark, sf):
        # the composed C4/Gopher curation decision with first-fail
        # reject reasons — ONE fused map-only projection (shares its
        # expression builders with the standalone language/quality/
        # repetition gates, so semantics stay pinned)
        return textstats.curation_report(
            _documents(spark, sf), lang="en", min_tokens=30,
            min_quality=0.7, max_dup_line=0.2, max_dup_ngram=0.05)
    q["curation_report"] = curation_report

    def text_lm_bigram(spark, sf):
        # CCNet-style LM quality filter: every doc scored by mean
        # ln-prob of its ordered bigrams under a bigram LM trained on
        # a deterministic 50% reference split (interpolated with an
        # add-one unigram floor, lam=0.9)
        return textstats.lm_bigram_logprob_scores(
            _documents(spark, sf), ref_rate=0.5, lam=0.9)
    q["text_lm_bigram"] = text_lm_bigram

    def text_chunks(spark, sf):
        # context-window chunking (training-data prep): whitespace
        # tokens cut into 64-token windows at stride 48 — one map-only
        # projection, no shuffle/UDF; final short chunks included,
        # empty docs emit none
        return textstats.chunk_documents(_documents(spark, sf),
                                         window=64, stride=48)
    q["text_chunks"] = text_chunks

    def text_bpe_pairs(spark, sf):
        # BPE training's first-iteration statistics: freq-weighted
        # adjacent character pairs over the word dictionary (Sennrich
        # 2016 get_stats) — exact top-20 by (count desc, left, right)
        return bpe.pair_counts(_documents(spark, sf), k=20)
    q["text_bpe_pairs"] = text_bpe_pairs

    def text_bpe_merges(spark, sf):
        # BPE tokenizer TRAINING: 6 merges learned from the corpus's
        # word-frequency dictionary — vocab-sized iterations, corpus
        # scanned once; deterministic tie-break makes the whole merge
        # sequence engine-replayable (unrolled-CTE DuckDB oracle)
        return bpe.train(_documents(spark, sf), n_merges=6)
    q["text_bpe_merges"] = text_bpe_merges

    def text_bpe_encode(spark, sf):
        # the ENCODE step composed with training: per-doc token count
        # under the 6 learned merges — distinct words segmented once
        # (all merges chained into one map-only projection), counts
        # joined back to the corpus
        docs = _documents(spark, sf)
        merges = [(r["left"], r["right"]) for r in
                  bpe.train(docs, n_merges=6).orderBy("merge_rank").collect()]
        return bpe.segment_counts(docs, merges)
    q["text_bpe_encode"] = text_bpe_encode

    def code_grep(spark, sf):
        # trigram-indexed exact substring search (Cox 2012 / the
        # "grep all source code" north-star op): candidates from an
        # AND over the needle's 3-grams, instr-verified + occurrence-
        # counted on the candidate docs only
        return codesearch.grep_literal(_documents(spark, sf),
                                       "sort table")
    q["code_grep"] = code_grep

    def code_grep_regex(spark, sf):
        # regex search with required-literal trigram pruning: the
        # extracted literal " table" drives the index probe, the regex
        # verify runs on candidates only (Java-regex ∩ RE2 subset)
        return codesearch.grep_regex(_documents(spark, sf),
                                     "s(ort|can) table")
    q["code_grep_regex"] = code_grep_regex

    def text_top_bigrams(spark, sf):
        # corpus n-gram statistics (n-gram LM data / common-phrase
        # report): exact top-20 bigrams by (count desc, ngram) — one
        # explode + one map-side-combined agg, cut via
        # TakeOrderedAndProject (never a full sort shuffle)
        return textstats.ngram_counts(_documents(spark, sf), n=2, k=20)
    q["text_top_bigrams"] = text_top_bigrams

    def text_pmi_bigrams(spark, sf):
        # collocation extraction: exact top-20 adjacent pairs by PMI
        # (Church & Hanks), hapax pairs dropped (n_xy >= 3); pmi rounds
        # to 6 dp BEFORE the (pmi desc, ngram) cut. Two map-side-combined
        # aggs whose exchanges Spark reuses for the totals, then
        # vocabulary-sized joins only.
        return textstats.pmi_bigrams(_documents(spark, sf), k=20,
                                     min_count=3)
    q["text_pmi_bigrams"] = text_pmi_bigrams

    # ---- multimodal plumbing ----
    def multimodal_features(spark, sf):
        # binary payload columns synthesized deterministically from the
        # documents table (UTF-8 bytes of text); exercises the REAL
        # multimodal plumbing end-to-end — typed metadata extraction
        # (attach_media_metadata) and the mapInPandas featureizer
        # (extract_features, deterministic fake decode per the brief:
        # media libs absent in this container). Feature floats are
        # returned as their exact byte values so the comparison is
        # integer-exact across engines.
        from information_retrieval_spark import multimodal as mm
        docs = _documents(spark, sf)
        media = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("media_type"),
            F.encode("text", "UTF-8").alias("payload"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.col("n_chars").cast("int").alias("duration_ms"))
        meta = mm.attach_media_metadata(media).select(
            F.col("doc_id").alias("id"), "n_bytes", "payload_sha")
        feats = mm.extract_features(media, fake=True).select(
            F.col("doc_id").alias("id"), "media_type",
            F.round(F.element_at("feature", 1) * 255).cast("long").alias("b0"),
            F.round(F.element_at("feature", 16) * 255).cast("long").alias("b15"))
        return (meta.join(feats, "id")
                .select("id", "media_type",
                        F.col("n_bytes").cast("long").alias("n_bytes"),
                        "payload_sha", "b0", "b15"))
    q["multimodal_features"] = multimodal_features

    def multimodal_frames(spark, sf):
        # metadata-driven video frame-sample fan-out (payload untouched)
        from information_retrieval_spark import multimodal as mm
        docs = _documents(spark, sf)
        media = docs.select("doc_id", F.col("n_chars").cast("int").alias("duration_ms"))
        return (mm.frame_sample_plan(media, every_ms=500)
                .select(F.col("doc_id").alias("id"),
                        F.col("frame_ts").cast("long").alias("frame_ts")))
    q["multimodal_frames"] = multimodal_frames

    # ---- similarity search ----
    def ann_cosine_topk(spark, sf):
        qv = _query_vec(spark, sf)
        return similarity.cosine_topk(_embeddings(spark, sf), qv, k=10,
                                      round_to=6).withColumnRenamed("id", "vec_id")
    q["ann_cosine_topk"] = ann_cosine_topk

    def ann_lsh_topk(spark, sf):
        # approximate (recall<1 vs brute force) but fully DETERMINISTIC
        # (exact DuckDB oracle), and gated through the PERSISTED
        # signature table: the probe is a `sig IN (...)` pushed scan of
        # the sorted signature parquet — signatures are computed once at
        # build, never per query (the round-2 inline-expression gate was
        # the one bench regression; tests/test_plans.py pins this plan)
        qv = _query_vec(spark, sf)
        return similarity.lsh_bucket_topk(
            _embeddings(spark, sf), qv, k=10, nbits=8,
            signatures=_ann_signatures(spark, sf)
        ).withColumnRenamed("id", "vec_id")
    q["ann_lsh_topk"] = ann_lsh_topk

    def ann_near_dup(spark, sf):
        # embedding-cosine near-dup: LSH Hamming<=1 candidates -> exact
        # cosine verify on candidates only. Candidates form on slim
        # (id, sig) projections from the persisted signature table;
        # vectors join back once for verification. The synthetic
        # embeddings are random (max pairwise cos ~0.51), so the gate
        # threshold sits at that corpus's similarity scale; a real
        # dedup run uses ~0.95.
        return similarity.embedding_near_duplicates(
            _embeddings(spark, sf), threshold=0.4, nbits=8, seed=42,
            signatures=_ann_signatures(spark, sf))
    q["ann_near_dup"] = ann_near_dup

    def ann_lsh_candidates(spark, sf):
        # the candidate set itself from the persisted signature table
        qv = _query_vec(spark, sf)
        planes = similarity._planes(len(qv), 8, 42)
        probe = similarity._hamming1_probes(
            similarity.signature_of(qv, planes), 8)
        return (_ann_signatures(spark, sf)
                .filter(F.col("sig").isin(probe))
                .select(F.col("id").alias("vec_id"), "sig")
                .orderBy("vec_id"))
    q["ann_lsh_candidates"] = ann_lsh_candidates

    def ann_banded_topk(spark, sf):
        # multi-table banded construction (L=16 tables x 8 bits,
        # Hamming<=1 per table): recall composes across tables —
        # >=0.95 recall@10 even on this adversarial i.i.d.-Gaussian
        # corpus (tests/test_ops.py::test_banded_lsh_recall)
        qv = _query_vec(spark, sf)
        return similarity.banded_lsh_topk(
            _embeddings(spark, sf), qv, k=10, n_tables=16, nbits=8,
            signatures=_banded_signatures(spark, sf)
        ).withColumnRenamed("id", "vec_id")
    q["ann_banded_topk"] = ann_banded_topk

    def ann_ivf_topk(spark, sf):
        # IVF-Flat: deterministic quantized k-means coarse quantizer
        # (trained + persisted once per corpus), probe the nprobe
        # nearest lists, exact cosine re-rank inside members — the
        # data-adaptive ANN scale path next to the LSH tables. The
        # oracle re-derives the SAME centroids from the same rows.
        cents, asg = _ivf_index(spark, sf)
        qv = _query_vec(spark, sf)
        return similarity.ivf_topk(
            _embeddings(spark, sf), qv, k=10, nprobe=2,
            centroids=cents, assignments=asg
        ).withColumnRenamed("id", "vec_id")
    q["ann_ivf_topk"] = ann_ivf_topk

    def ann_semdedup_pairs(spark, sf):
        # SemDeDup (Abbas et al. 2023): k-means cluster blocking ->
        # exact cosine verify WITHIN clusters only — the data-adaptive
        # embedding-dedup family next to hyperplane LSH (ann_near_dup).
        # Reuses the persisted IVF quantizer; recall < 1 by contract
        # (cross-cluster pairs unseen) and the oracle re-derives the
        # same clusters, making that contract the graded semantics.
        # Random corpus -> threshold at its similarity scale (~0.4).
        cents, asg = _ivf_index(spark, sf)
        return similarity.semantic_near_duplicates(
            _embeddings(spark, sf), threshold=0.4,
            centroids=cents, assignments=asg)
    q["ann_semdedup_pairs"] = ann_semdedup_pairs

    def sample_split(spark, sf):
        # deterministic per-language stratified sample + train/val
        # split: pure filtered scan (no shuffle at any scale), stable
        # under repartitioning/appends, exact cross-engine oracle
        d = sampling.stratified_sample(_documents(spark, sf),
                                       {"en": 0.5, "de": 0.3}, "lang",
                                       default_rate=0.2, key_col="doc_id",
                                       seed="s1")
        return (sampling.train_val_split(d, 0.25, key_col="doc_id", seed="s2")
                .select(F.col("doc_id").alias("id"), "lang", "split"))
    q["sample_split"] = sample_split

    def dedup_clusters(spark, sf):
        # the full dedup pipeline: LSH candidates -> exact verify ->
        # connected components (large-star/small-star) -> canonical
        # cluster assignment with sizes
        return dedup.duplicate_clusters(_documents(spark, sf), n=3,
                                        threshold=0.8, num_hashes=64,
                                        band_size=8)
    q["dedup_clusters"] = dedup_clusters

    def dedup_canonical(spark, sf):
        # quality-aware representative selection after dedup: mark the
        # HIGHEST-quality member of each duplicate cluster (ties ->
        # smallest id) as the keeper; one window shuffle over cluster
        # members only, never over the corpus
        docs = _documents(spark, sf)
        cl = dedup.duplicate_clusters(docs, n=3, threshold=0.8,
                                      num_hashes=64, band_size=8)
        return dedup.canonical_documents(cl, textstats.quality_scores(docs))
    q["dedup_canonical"] = dedup_canonical

    def bm25_filtered(spark, sf):
        # metadata-filtered ranking: the lang='en' filter participates
        # in the top-k (kernel-level sorted-docID mask below the
        # pushdown cap; emit-all + join above it), so the page is the
        # exact top-10 OF the filtered subcorpus — not a re-filter of
        # the unfiltered page
        e = _engine(spark, sf)
        top = e.bm25_filtered("spark join window", F.col("lang") == "en",
                              k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["bm25_filtered"] = bm25_filtered

    def bm25_phrase(spark, sf):
        # phrase-constrained ranking: the '"table merge" must appear'
        # positional constraint restricts WHO is ranked (exact top-10
        # of the phrase-matching subcorpus; idf stays corpus-global)
        e = _engine(spark, sf)
        top = e.bm25_phrase("spark join window", "table merge", k=10)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["bm25_phrase"] = bm25_phrase

    def related_terms(spark, sf):
        # pseudo-relevance feedback: terms most characteristic of the
        # query's top-25 BM25 docs, scored df_in_set * global idf with
        # the query's own terms excluded (the "related searches" row)
        e = _engine(spark, sf)
        return e.related_terms("spark join", k=10, top_docs=25)
    q["related_terms"] = related_terms

    def prf_bm25(spark, sf):
        # two-pass PRF retrieval: 'spark join' page -> top-5 expansion
        # terms (related_terms' rounded df_S*idf cut) -> BM25 over the
        # union term set; the whole pipeline re-derived relationally in
        # the oracle
        e = _engine(spark, sf)
        top = e.prf_bm25("spark join", k=10, fb_terms=5, top_docs=25)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["prf_bm25"] = prf_bm25

    def more_like_this(spark, sf):
        # query-by-document: source doc 42's top-5 tf·idf terms become a
        # BM25 query; the source is excluded AFTER a k+1 page cut (true
        # top-k of the remaining corpus). Term selection rounds the
        # weight to 6 dp before the (w desc, term) cut — deterministic
        # and engine-portable.
        e = _engine(spark, sf)
        dm = e.index.table("doc_map")
        src = int(dm.filter(F.col("path").cast("long") == 42)
                  .select("docID").collect()[0][0])
        top = e.more_like_this(src, k=10, n_terms=5)
        ids = dm.select("docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(ids, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["more_like_this"] = more_like_this

    def doc_vector(spark, sf):
        # doc-major FORWARD index: build_forward_index materializes
        # doc_vec(docID, term, tf) sorted by docID (one decode pass over
        # the postings), and doc_term_vector becomes one file- and
        # row-group-pruned scan — the acceleration structure for
        # query-by-document traffic. Idempotent across gate runs.
        e = _engine(spark, sf)
        e.build_forward_index()
        dm = e.index.table("doc_map")
        src = int(dm.filter(F.col("path").cast("long") == 7)
                  .select("docID").collect()[0][0])
        return (e.doc_term_vector(src)
                .select("term", F.col("tf").cast("long").alias("tf")))
    q["doc_vector"] = doc_vector

    def tfidf_keywords(spark, sf):
        # corpus-wide keyword extraction: the top-3 tf·idf terms of
        # EVERY document in one decode pass + one docID window — the
        # batch form of more_like_this's term-selection step. Weights
        # round to 6 dp BEFORE the rank cut, ties break on term asc
        # (the deterministic hard-cut discipline of the other ranked
        # gates).
        e = _engine(spark, sf)
        dm = e.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (e.tfidf_top_terms(k=3).join(dm, "docID")
                .select("doc_id", "term",
                        F.col("tf").cast("long").alias("tf"),
                        "w", F.col("rank").cast("long").alias("rank")))
    q["tfidf_keywords"] = tfidf_keywords

    def eval_ndcg(spark, sf):
        # retrieval-quality evaluation as an operator: NDCG@10 of the
        # BM25 page for the 3-query batch, graded against capped-tf
        # qrels (rel = min(sum tf of query terms, 10)) derived from the
        # corpus itself; IDCG via grade-run counts, never a candidate
        # sort (see QueryEngine.eval_ndcg)
        e = _engine(spark, sf)
        return e.eval_ndcg(_BM25_BATCH, k=10)
    q["eval_ndcg"] = eval_ndcg

    def eval_metrics(spark, sf):
        # set/rank retrieval evaluation: P@10 / R@10 / AP@10 / RR of
        # the BM25 page for the 3-query batch against binary
        # AND-coverage qrels (doc contains EVERY query term) derived
        # from the corpus itself (see QueryEngine.eval_metrics)
        e = _engine(spark, sf)
        return e.eval_metrics(_BM25_BATCH, k=10)
    q["eval_metrics"] = eval_metrics

    def term_zipf_fit(spark, sf):
        # corpus collection-statistics diagnostic: least-squares Zipf
        # fit (log10 cf on log10 rank) over the term dictionary, with
        # NO vocabulary sort — rank runs from per-cf counts
        e = _engine(spark, sf)
        return e.zipf_fit()
    q["term_zipf_fit"] = term_zipf_fit

    def collection_stats(spark, sf):
        # the index health report: build-time stats read-back + one
        # map-side aggregate over the dictionary (no postings touched)
        e = _engine(spark, sf)
        return e.collection_stats()
    q["collection_stats"] = collection_stats

    def term_heaps_fit(spark, sf):
        # vocabulary-growth diagnostic: Heaps' law V(N) ~ K*N^beta
        # fitted over per-doc-prefix cumulative (tokens, vocabulary)
        # points in docID order — first appearances from the postings
        # block metadata, cumulative pair via a distributed prefix sum
        # (see QueryEngine.heaps_fit)
        e = _engine(spark, sf)
        return e.heaps_fit()
    q["term_heaps_fit"] = term_heaps_fit

    def delete_requery(spark, sf):
        # streaming deletes (tombstones): docs deleted from a LIVE index
        # leave every page immediately — BM25 excludes them inside the
        # scoring kernel BEFORE the top-k cut (a post-hoc re-filter of
        # the unfiltered page would under-fill), while N/avgdl/df stay
        # as-built until compact() (Lucene-style visibility). The gate
        # queries the PRE-compact state: the oracle scores with
        # full-corpus statistics and drops deleted docs before LIMIT.
        from information_retrieval_spark.streaming import IncrementalIndexer
        tag = os.path.abspath(sf).strip("/").replace("/", "_")
        del_dir = os.path.join(
            tempfile.gettempdir(),
            f"irs_index_del_v{INDEX_FORMAT_VERSION}_{tag}")
        docs = load_testdata_documents(spark, sf)
        idx = IndexBuilder(spark, del_dir, IndexConfig()).build(docs,
                                                               resume=True)
        inc = IncrementalIndexer(spark, del_dir, IndexConfig())
        doomed = (idx.table("doc_map")
                  .filter(F.col("path").cast("long") % 7 == 3)
                  .select("docID"))
        inc.delete_batch(doc_ids=doomed, batch_id=1)  # replay: no-op
        qe = QueryEngine(inc.index())
        top = qe.bm25("spark join window", k=10, wand=True)
        dm = qe.index.table("doc_map").select(
            "docID", F.col("path").cast("long").alias("doc_id"))
        return (top.join(dm, "docID")
                .select("doc_id", F.round("score", 6).alias("score")))
    q["delete_requery"] = delete_requery

    def shard_tokens(spark, sf):
        # token-budget sharding: contiguous ~4096-ws-token shards via a
        # two-phase distributed prefix sum (no global sort, no
        # single-reducer window); the oracle IS the window formulation
        return sampling.shard_by_token_budget(
            _documents(spark, sf), budget_tokens=4096)
    q["shard_tokens"] = shard_tokens

    return q


def _ann_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted single-table ANN signatures for a testdata dir (built
    once per scale factor, reused across gates — the 10^12-row shape)."""
    tag = os.path.abspath(sf).strip("/").replace("/", "_")
    sig_dir = os.path.join(tempfile.gettempdir(), f"irs_ann_sigs_v2_{tag}")
    return similarity.persist_signatures(
        _embeddings(spark, sf), sig_dir, nbits=8, seed=42)


def _ivf_index(spark: SparkSession, sf: str):
    """Persisted IVF index (centroids + assignments) for a testdata dir.
    The coarse quantizer trains on a deterministic 50% hash sample
    (standard IVF practice — at 10^12 rows, `iters` full-corpus
    training scans would dominate the build; assignments still scan
    everything once, which is inherent)."""
    tag = os.path.abspath(sf).strip("/").replace("/", "_")
    # path keyed by params: a persisted IVF index is only valid for the
    # (n_lists, iters, train_rate, dataset) it was trained on
    return similarity.persist_ivf(
        _embeddings(spark, sf),
        os.path.join(tempfile.gettempdir(), f"irs_ann_ivf_L8i2t50_{tag}"),
        n_lists=8, iters=2, train_rate=0.5)


def _banded_signatures(spark: SparkSession, sf: str) -> DataFrame:
    """Persisted multi-table (banded) ANN signatures, sorted by
    (table, sig) so per-table probes prune row groups."""
    tag = os.path.abspath(sf).strip("/").replace("/", "_")
    sig_dir = os.path.join(tempfile.gettempdir(), f"irs_ann_banded_{tag}")
    if not os.path.exists(os.path.join(sig_dir, "_SUCCESS")):
        (similarity.build_banded_signatures(
            _embeddings(spark, sf), n_tables=16, nbits=8, seed=42)
         .repartitionByRange(4, "table", "sig")
         .sortWithinPartitions("table", "sig")
         .write.mode("overwrite").parquet(sig_dir))
    return spark.read.parquet(sig_dir)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["term_stats"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cf
        FROM ex GROUP BY term
    """

    o["term_ordinals"] = f"""
        WITH {_TOKS}, {_EX},
        terms AS (SELECT DISTINCT term FROM ex)
        SELECT term,
               (row_number() OVER (ORDER BY term) - 1)::BIGINT AS term_ord
        FROM terms
    """

    o["doc_lengths"] = f"""
        WITH {_TOKS}
        SELECT doc_id, len(t)::BIGINT AS dl FROM toks
    """

    o["dict_prefix_terms"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        FROM ex WHERE term LIKE 's%' GROUP BY term
    """

    o["dict_suffix_terms"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        FROM ex WHERE term LIKE '%ow' GROUP BY term
    """

    o["dict_fuzzy_terms"] = f"""
        WITH {_TOKS}, {_EX},
        terms AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                  FROM ex GROUP BY term)
        SELECT term, df, levenshtein(term, 'part')::INT AS dist
        FROM terms WHERE levenshtein(term, 'part') <= 2
    """

    o["dict_fuzzy_suggest"] = f"""
        WITH {_TOKS}, {_EX},
        terms AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                  FROM ex GROUP BY term)
        SELECT term, df, levenshtein(term, 'ron')::INT AS dist
        FROM terms WHERE levenshtein(term, 'ron') <= 2
        ORDER BY dist, df DESC, term LIMIT 2
    """

    o["boolean_and"] = f"""
        WITH {_TOKS}
        SELECT doc_id FROM toks
        WHERE list_contains(t, 'spark') AND list_contains(t, 'join')
        ORDER BY doc_id
    """

    o["boolean_or_not"] = f"""
        WITH {_TOKS}
        SELECT doc_id FROM toks
        WHERE (list_contains(t, 'table') AND NOT list_contains(t, 'merge'))
           OR (list_contains(t, 'spark') AND list_contains(t, 'window'))
        ORDER BY doc_id
    """

    o["positional_within"] = f"""
        WITH {_TOKS}, {_POS}
        SELECT DISTINCT a.doc_id AS doc_id
        FROM pos a JOIN pos b USING (doc_id)
        WHERE a.term = 'spark' AND b.term = 'join' AND abs(a.p - b.p) <= 3
        ORDER BY doc_id
    """

    o["phrase_exact"] = f"""
        WITH {_TOKS}, {_POS}
        SELECT DISTINCT a.doc_id AS doc_id
        FROM pos a
        JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
        JOIN pos c ON c.doc_id = a.doc_id AND c.p = a.p + 2
        WHERE a.term = 'row' AND b.term = 'column' AND c.term = 'sort'
        ORDER BY doc_id
    """

    o["joker_prefix_suffix"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT doc_id FROM (
            SELECT DISTINCT doc_id FROM ex WHERE term LIKE 'st%'
            INTERSECT
            SELECT DISTINCT doc_id FROM ex WHERE term LIKE '%ow'
        ) ORDER BY doc_id
    """

    o["joker_middle"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT DISTINCT doc_id FROM ex
        WHERE term LIKE 's%' AND regexp_matches(term, '.*a.*')
        ORDER BY doc_id
    """

    o["bm25_topk"] = f"""
        WITH {_TOKS},
        {_bm25_ctes()}
        SELECT doc_id, round(s, 6) AS score
        FROM scores ORDER BY s DESC, doc_id LIMIT 10
    """

    # did-you-mean retrieval: per-token top correction by
    # (levenshtein asc, df desc, term asc) over the length-banded
    # vocabulary, then BM25 over the DISTINCT corrected terms — the
    # same dynamic-term CTE shape as more_like_this
    o["search_corrected"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                  FROM ex GROUP BY term),
        qt AS (SELECT unnest(['sparkk', 'joinn', 'window']) AS q),
        cand AS (SELECT qt.q, dfreq.term, dfreq.df,
                        levenshtein(dfreq.term, qt.q) AS dist
                 FROM dfreq, qt
                 WHERE abs(length(dfreq.term) - length(qt.q)) <= 2
                   AND levenshtein(dfreq.term, qt.q) <= 2),
        corr AS (SELECT DISTINCT term FROM (
            SELECT q, term, row_number() OVER
                (PARTITION BY q ORDER BY dist, df DESC, term) AS rn
            FROM cand) WHERE rn = 1),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM ex JOIN corr USING (term) GROUP BY doc_id, term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf.doc_id)
        SELECT doc_id, round(s, 6) AS score
        FROM scores ORDER BY s DESC, doc_id LIMIT 10
    """

    # boosted BM25: the shared idf is multiplied by the per-term boost
    # INSIDE the score sum — float association mirrors the engine's
    # idf_map[t] = idf * boost (one product before the kernel)
    o["bm25_boosted"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ex
               WHERE term IN ('spark', 'join', 'window')
               GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        scores AS (
            SELECT tf.doc_id,
                   sum((ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                        * CASE tf.term WHEN 'spark' THEN 2.0
                                       WHEN 'window' THEN 0.5
                                       ELSE 1.0 END)
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf.doc_id)
        SELECT doc_id, round(s, 6) AS score
        FROM scores ORDER BY s DESC, doc_id LIMIT 10
    """

    # Dirichlet query-likelihood: rank-equivalent decomposition
    # sum ln(1 + tf/(mu*cf/T)) + |q|*(ln mu - ln(mu+dl)), mu=2000;
    # 2000.0 * (cf / T) mirrors the engine's w_t float association,
    # qlen counts the DISTINCT query terms present in the vocabulary
    # (the engine drops dictionary-absent terms before scoring)
    o["qlm_topk"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        coll AS (SELECT count(*)::DOUBLE AS total_len FROM ex),
        cfq AS (SELECT term, count(*)::DOUBLE AS cf FROM ex
                WHERE term IN ('spark', 'join', 'window') GROUP BY term),
        qn AS (SELECT count(*)::DOUBLE AS qlen FROM cfq),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ex
               WHERE term IN ('spark', 'join', 'window')
               GROUP BY doc_id, term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + tf.tf / (2000.0 * (cfq.cf / coll.total_len))))
                   + qn.qlen * (ln(2000.0) - ln(2000.0 + dl.dl)) AS s
            FROM tf JOIN cfq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN coll CROSS JOIN qn
            GROUP BY tf.doc_id, dl.dl, qn.qlen)
        SELECT doc_id, round(s, 6) AS score
        FROM scores ORDER BY s DESC, doc_id LIMIT 10
    """

    # pseudo-relevance feedback: the top_docs CTE is the exact BM25
    # page for 'spark join' (shared float math with bm25_topk), then
    # df-in-set * global idf over the page's vocabulary, query terms
    # excluded, rounded before the deterministic (w desc, term) cut
    o["related_terms"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                  FROM ex GROUP BY term),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ex
               WHERE term IN ('spark', 'join') GROUP BY doc_id, term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf.doc_id),
        top_docs AS (SELECT doc_id FROM scores
                     ORDER BY s DESC, doc_id LIMIT 25),
        cand AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df_s
                 FROM ex JOIN top_docs USING (doc_id)
                 WHERE term NOT IN ('spark', 'join') GROUP BY term)
        SELECT term, df_s,
               round(df_s * ln(1 + (st.n - dfreq.df + 0.5)
                               / (dfreq.df + 0.5)), 6) AS w
        FROM cand JOIN dfreq USING (term) CROSS JOIN st
        ORDER BY w DESC, term LIMIT 10
    """

    # two-pass PRF retrieval: base BM25 page ('spark join', shared
    # float math with bm25_topk) -> the related_terms expansion cut
    # (df_S*idf rounded to 6 dp, desc, then term) -> BM25 over the
    # UNION of base and expansion terms. The whole pipeline is
    # relational; both passes share dl/st/dfreq.
    o["prf_bm25"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                  FROM ex GROUP BY term),
        tf0 AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM ex
                WHERE term IN ('spark', 'join') GROUP BY doc_id, term),
        scores0 AS (
            SELECT tf0.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf0.tf * (1.2 + 1.0)
                       / (tf0.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf0 JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf0.doc_id),
        top_docs AS (SELECT doc_id FROM scores0
                     ORDER BY s DESC, doc_id LIMIT 25),
        cand AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df_s
                 FROM ex JOIN top_docs USING (doc_id)
                 WHERE term NOT IN ('spark', 'join') GROUP BY term),
        expterms AS (
            SELECT term FROM cand JOIN dfreq USING (term) CROSS JOIN st
            ORDER BY round(df_s * ln(1 + (st.n - dfreq.df + 0.5)
                                     / (dfreq.df + 0.5)), 6) DESC, term
            LIMIT 5),
        allterms AS (SELECT term FROM expterms
                     UNION SELECT unnest(['spark', 'join']) AS term),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM ex JOIN allterms USING (term) GROUP BY doc_id, term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf.doc_id)
        SELECT doc_id, round(s, 6) AS score
        FROM scores ORDER BY s DESC, doc_id LIMIT 10
    """

    # query-by-document: the qterms CTE re-derives the engine's exact
    # term selection (tf·idf rounded to 6 dp, desc, then term) from the
    # raw documents table, then standard BM25 over the selected set with
    # the source dropped BEFORE the LIMIT
    o["more_like_this"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                  FROM ex GROUP BY term),
        srctf AS (SELECT term, count(*)::DOUBLE AS tf FROM ex
                  WHERE doc_id = 42 GROUP BY term),
        qterms AS (
            SELECT srctf.term
            FROM srctf JOIN dfreq USING (term) CROSS JOIN st
            ORDER BY round(srctf.tf * ln(1 + (st.n - dfreq.df + 0.5)
                                             / (dfreq.df + 0.5)), 6) DESC,
                     srctf.term
            LIMIT 5),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
               FROM ex JOIN qterms USING (term) GROUP BY doc_id, term),
        scores AS (
            SELECT tf.doc_id,
                   sum(ln(1 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS s
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st GROUP BY tf.doc_id)
        SELECT doc_id, round(s, 6) AS score
        FROM scores WHERE doc_id != 42
        ORDER BY s DESC, doc_id LIMIT 10
    """

    # forward-index read-back: (term, tf) of doc 7 — doc_vec is exactly
    # the per-doc tokenizer multiset, independent of the storage layout
    o["doc_vector"] = f"""
        WITH {_TOKS}, {_EX}
        SELECT term, count(*)::BIGINT AS tf
        FROM ex WHERE doc_id = 7 GROUP BY term
    """

    # corpus-wide keyword extraction: per-doc tf * global idf (the
    # shared idf formula of the bm25 gates), rounded to 6 dp BEFORE the
    # per-doc (w desc, term) rank cut — the deterministic hard-cut
    # discipline that makes the page engine-portable
    o["tfidf_keywords"] = f"""
        WITH {_TOKS}, {_EX},
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM ex GROUP BY doc_id, term),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                  FROM ex GROUP BY term),
        st AS (SELECT count(*)::DOUBLE AS n FROM toks),
        w AS (SELECT tf.doc_id, tf.term, tf.tf,
                     round(tf.tf * ln(1 + (st.n - dfreq.df + 0.5)
                                      / (dfreq.df + 0.5)), 6) AS w
              FROM tf JOIN dfreq USING (term) CROSS JOIN st),
        r AS (SELECT *, row_number() OVER
                  (PARTITION BY doc_id ORDER BY w DESC, term) AS rank
              FROM w)
        SELECT doc_id, term, tf, w, rank::BIGINT AS rank
        FROM r WHERE rank <= 3
    """

    # streaming deletes pre-compact: scores use AS-BUILT full-corpus
    # statistics (st/dfreq over ALL docs — Lucene visibility), deleted
    # docs (doc_id % 7 == 3, the gate's doomed set) drop BEFORE the
    # top-k cut so they can never shadow a live doc out of the page
    o["delete_requery"] = f"""
        WITH {_TOKS},
        {_bm25_ctes()}
        SELECT doc_id, round(s, 6) AS score
        FROM scores WHERE doc_id % 7 != 3
        ORDER BY s DESC, doc_id LIMIT 10
    """

    # batched BM25: each query's exact top-10 recomputed independently
    # (shared toks/dl/st CTEs), unioned under its qid — checks that the
    # ONE-job batched kernel returns exactly the per-query results
    _batch_ctes = ",".join(_bm25_scores_cte(_BM25_BATCH_TERMS[qid], f"_{i}")
                           for i, qid in enumerate(sorted(_BM25_BATCH)))
    _batch_sel = " UNION ALL ".join(
        f"SELECT * FROM (SELECT '{qid}' AS qid, doc_id, round(s, 6) AS score "
        f"FROM scores_{i} ORDER BY s DESC, doc_id LIMIT 10)"
        for i, qid in enumerate(sorted(_BM25_BATCH)))
    o["bm25_batch"] = f"""
        WITH {_TOKS},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        {_batch_ctes}
        {_batch_sel}
        ORDER BY qid, score DESC, doc_id
    """

    # NDCG@10 of each batch query's BM25 page: rel = min(total tf of
    # the query's terms in the doc, 10) — graded, discriminative on
    # this vocabulary (coverage grading saturates at 1.0); DCG over the
    # row_number page order, IDCG over the (rel desc, doc_id) ideal
    # ordering — the oracle sorts the candidates outright (fine at
    # sf0.01), the engine derives the same rank positions from grade
    # counts; the (rel, rank) multisets are identical because ties
    # share a grade
    _ndcg_ctes = []
    _ndcg_parts = []
    for i, qid in enumerate(sorted(_BM25_BATCH)):
        in_terms = ", ".join(f"'{t}'" for t in _BM25_BATCH_TERMS[qid])
        _ndcg_ctes.append(f"""
        rel_{i} AS (SELECT doc_id, least(count(*), 10)::DOUBLE AS rel
                    FROM ex WHERE term IN ({in_terms}) GROUP BY doc_id),
        page_{i} AS (SELECT doc_id, rnk FROM (
            SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
            FROM scores_{i}) WHERE rnk <= 10),
        d_{i} AS (SELECT sum((pow(2, r.rel) - 1) / log2(1 + p.rnk)) AS dcg
                  FROM page_{i} p JOIN rel_{i} r USING (doc_id)),
        i_{i} AS (SELECT sum((pow(2, rel) - 1) / log2(1 + rnk)) AS idcg FROM (
            SELECT rel, doc_id,
                   row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
            FROM rel_{i}) WHERE rnk <= 10)""")
        _ndcg_parts.append(
            f"SELECT '{qid}' AS qid, round(d_{i}.dcg / i_{i}.idcg, 6) AS ndcg "
            f"FROM d_{i}, i_{i}")
    o["eval_ndcg"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        {_batch_ctes},
        {",".join(_ndcg_ctes)}
        {" UNION ALL ".join(_ndcg_parts)}
        ORDER BY qid
    """

    # P@10 / R@10 / AP@10 / RR of each batch query's BM25 page against
    # binary AND-coverage qrels (doc contains EVERY query term). nt is
    # derived from ex (a term with >=1 posting is in the dictionary and
    # vice versa), matching the engine's dictionary-present filter;
    # n_rel = 0 queries are dropped on both sides.
    _em_ctes = []
    _em_parts = []
    for i, qid in enumerate(sorted(_BM25_BATCH)):
        in_terms = ", ".join(f"'{t}'" for t in _BM25_BATCH_TERMS[qid])
        _em_ctes.append(f"""
        reln_{i} AS (SELECT count(DISTINCT term) AS nt FROM ex
                     WHERE term IN ({in_terms})),
        relb_{i} AS (SELECT doc_id FROM (
            SELECT doc_id, count(DISTINCT term) AS m FROM ex
            WHERE term IN ({in_terms}) GROUP BY doc_id), reln_{i}
            WHERE m = nt),
        cb_{i} AS (SELECT rnk, is_rel,
                          sum(is_rel) OVER (ORDER BY rnk) AS cum FROM (
            SELECT p.rnk,
                   CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
            FROM (SELECT doc_id, rnk FROM (
                SELECT doc_id,
                       row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
                FROM scores_{i}) WHERE rnk <= 10) p
            LEFT JOIN relb_{i} r USING (doc_id))),
        mb_{i} AS (SELECT coalesce(sum(is_rel), 0)::DOUBLE AS hits,
                          coalesce(sum(CASE WHEN is_rel = 1
                                       THEN cum::DOUBLE / rnk END), 0) AS ap_num,
                          coalesce(max(CASE WHEN is_rel = 1
                                       THEN 1.0 / rnk END), 0) AS rr0
                   FROM cb_{i}),
        nb_{i} AS (SELECT count(*)::BIGINT AS n_rel FROM relb_{i})""")
        _em_parts.append(f"""
        SELECT '{qid}' AS qid, n_rel,
               round(hits / 10, 6) AS p_at_k,
               round(hits / n_rel, 6) AS r_at_k,
               round(ap_num / least(n_rel, 10), 6) AS ap,
               round(rr0, 6) AS rr
        FROM mb_{i}, nb_{i} WHERE n_rel > 0""")
    o["eval_metrics"] = f"""
        WITH {_TOKS}, {_EX},
        dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toks),
        st AS (SELECT count(*)::DOUBLE AS n, avg(len(t)) AS avgdl FROM toks),
        {_batch_ctes},
        {",".join(_em_ctes)}
        {" UNION ALL ".join(_em_parts)}
        ORDER BY qid
    """

    # Zipf fit: the oracle ranks the vocabulary with an outright
    # row_number sort (ties by term); the engine never sorts — rank
    # runs from per-cf counts. Tie order is regression-invariant (tying
    # terms share y), so the (x, y) multisets are identical. Explicit
    # least-squares sums on both sides (no reliance on regr_* aggregate
    # implementation details).
    o["term_zipf_fit"] = f"""
        WITH {_TOKS}, {_EX},
        tstats AS (SELECT term, count(*)::BIGINT AS cf FROM ex GROUP BY term),
        ranked AS (SELECT cf, row_number() OVER (ORDER BY cf DESC, term)
                       AS rank FROM tstats),
        pts AS (SELECT log10(rank::DOUBLE) AS x, log10(cf::DOUBLE) AS y
                FROM ranked),
        s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              FROM pts)
        SELECT n::BIGINT AS n_terms,
               round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
               round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
                   AS intercept,
               round(pow(n*sxy - sx*sy, 2)
                     / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        FROM s
    """

    # collection stats: every number re-derived from the raw documents
    # (vocabulary, Σdf, Σtokens, head-term reach); avgdl is the same
    # float64 total_len / n_docs division the builder stores
    o["collection_stats"] = f"""
        WITH {_TOKS}, {_EX},
        tstats AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
                          count(*)::BIGINT AS cf FROM ex GROUP BY term),
        agg AS (SELECT count(*)::BIGINT AS n_terms,
                       sum(df)::BIGINT AS n_postings,
                       max(df)::BIGINT AS max_df,
                       max(cf)::BIGINT AS max_cf FROM tstats),
        base AS (SELECT count(*)::BIGINT AS n_docs,
                        sum(len(t))::BIGINT AS total_len FROM toks)
        SELECT n_docs, n_terms, n_postings, total_len,
               round(total_len::DOUBLE / n_docs, 6) AS avgdl,
               max_df, max_cf
        FROM base, agg
    """

    # Heaps fit: the oracle replays the engine's docID order (rank of
    # (source, doc_id-as-string) — build._build_doc_map's key) with an
    # outright row_number sort and a serial cumulative window; the
    # engine never globally sorts (bucket prefix sums). Point sets are
    # identical because the cumulative pair per prefix is exact integer
    # arithmetic on both sides.
    o["term_heaps_fit"] = f"""
        WITH {_TOKS}, {_EX},
        ordq AS (SELECT doc_id, row_number() OVER
                     (ORDER BY source, CAST(doc_id AS VARCHAR)) AS rn
                 FROM documents),
        dlq AS (SELECT o.rn, len(t.t)::BIGINT AS dl
                FROM toks t JOIN ordq o USING (doc_id)),
        firstq AS (SELECT term, min(o.rn) AS rn
                   FROM ex JOIN ordq o USING (doc_id) GROUP BY term),
        nvq AS (SELECT rn, count(*)::BIGINT AS nv FROM firstq GROUP BY rn),
        cums AS (SELECT d.rn,
                        sum(d.dl) OVER (ORDER BY d.rn) AS ct,
                        sum(coalesce(n.nv, 0)) OVER (ORDER BY d.rn) AS cv
                 FROM dlq d LEFT JOIN nvq n USING (rn)),
        pts AS (SELECT log10(ct::DOUBLE) AS x, log10(cv::DOUBLE) AS y
                FROM cums WHERE ct > 0 AND cv > 0),
        s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              FROM pts)
        SELECT n::BIGINT AS n_points,
               round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS beta,
               round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
                   AS log10_k,
               round(pow(n*sxy - sx*sy, 2)
                     / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
        FROM s
    """

    # snippet windows over the top-10 page: the oracle recomputes the
    # minimal covering window with an O(occ^2) relational formulation
    # (for every candidate END position, the best START is the min over
    # terms of that term's latest occurrence <= end; valid iff every
    # term has one), while the Spark side runs a two-pointer sweep in
    # an Arrow kernel — algorithm-diverse equality on (len, start)
    # lexicographic minimality
    o["bm25_snippets"] = f"""
        WITH {_TOKS}, {_POS},
        {_bm25_ctes()},
        top AS (SELECT doc_id, round(s, 6) AS score
                FROM scores ORDER BY s DESC, doc_id LIMIT 10),
        occ AS (SELECT p.doc_id, p.term, p.p
                FROM pos p JOIN top USING (doc_id)
                WHERE p.term IN ('spark', 'join', 'window')),
        need AS (SELECT doc_id, count(DISTINCT term) AS need
                 FROM occ GROUP BY doc_id),
        ends AS (SELECT DISTINCT doc_id, p AS pe FROM occ),
        latest AS (SELECT e.doc_id, e.pe, o.term, max(o.p) AS lp
                   FROM ends e
                   JOIN occ o ON o.doc_id = e.doc_id AND o.p <= e.pe
                   GROUP BY 1, 2, 3),
        cover AS (SELECT doc_id, pe, count(*) AS nt, min(lp) AS ws
                  FROM latest GROUP BY doc_id, pe),
        valid AS (SELECT c.doc_id, c.ws, c.pe
                  FROM cover c JOIN need n
                    ON n.doc_id = c.doc_id AND c.nt = n.need),
        best AS (SELECT doc_id, ws, pe, row_number() OVER (
                     PARTITION BY doc_id ORDER BY pe - ws, ws) AS rn
                 FROM valid)
        SELECT t.doc_id, t.score, b.ws::INT AS win_start,
               b.pe::INT AS win_end, n.need::INT AS n_terms
        FROM top t
        JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
        JOIN need n ON n.doc_id = t.doc_id
    """

    # proximity rerank: top-25 pool + the snippets oracle's O(occ^2)
    # minimal-window formulation + the same float association as the
    # engine ((alpha*(n_terms-1))/window_len added to the UNROUNDED
    # BM25 score, rounded to 6 dp before the final cut)
    o["bm25_proximity"] = f"""
        WITH {_TOKS}, {_POS},
        {_bm25_ctes()},
        top AS (SELECT doc_id, s
                FROM scores ORDER BY s DESC, doc_id LIMIT 25),
        occ AS (SELECT p.doc_id, p.term, p.p
                FROM pos p JOIN top USING (doc_id)
                WHERE p.term IN ('spark', 'join', 'window')),
        need AS (SELECT doc_id, count(DISTINCT term) AS need
                 FROM occ GROUP BY doc_id),
        ends AS (SELECT DISTINCT doc_id, p AS pe FROM occ),
        latest AS (SELECT e.doc_id, e.pe, o.term, max(o.p) AS lp
                   FROM ends e
                   JOIN occ o ON o.doc_id = e.doc_id AND o.p <= e.pe
                   GROUP BY 1, 2, 3),
        cover AS (SELECT doc_id, pe, count(*) AS nt, min(lp) AS ws
                  FROM latest GROUP BY doc_id, pe),
        valid AS (SELECT c.doc_id, c.ws, c.pe
                  FROM cover c JOIN need n
                    ON n.doc_id = c.doc_id AND c.nt = n.need),
        best AS (SELECT doc_id, ws, pe, row_number() OVER (
                     PARTITION BY doc_id ORDER BY pe - ws, ws) AS rn
                 FROM valid),
        rer AS (SELECT t.doc_id,
                       round(t.s + (1.0 * (n.need - 1))
                             / (b.pe - b.ws + 1), 6) AS score
                FROM top t
                JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
                JOIN need n ON n.doc_id = t.doc_id)
        SELECT doc_id, score FROM rer ORDER BY score DESC, doc_id LIMIT 10
    """

    o["dedup_exact"] = """
        SELECT sha256(text) AS content_hash, count(*)::BIGINT AS n_docs,
               min(doc_id) AS canonical_id
        FROM documents GROUP BY 1 HAVING count(*) >= 2
    """

    # candidate-driven: LSH band collisions (16 hashes, 8 bands of 2,
    # 2-gram shingle features) propose pairs; exact 2-gram Jaccard >=0.3
    # verifies — mirrors the Spark gate's scale shape exactly (the `sh`
    # CTE from the minhash block doubles as the verification shingles)
    o["dedup_ngram_jaccard_lsh"] = f"""
        WITH {_TOKS},
        {_minhash_lsh_ctes(num_hashes=16, band_size=2, n=2)},
        sizes AS (SELECT id, count(*)::BIGINT AS n_sh FROM sh GROUP BY id),
        inter AS (
            SELECT id_a, id_b, count(*)::BIGINT AS i
            FROM cand
            JOIN sh a ON a.id = id_a
            JOIN sh b ON b.id = id_b AND b.feature = a.feature
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.3
    """

    o["dedup_minhash_lsh"] = f"""
        WITH {_TOKS},
        {_minhash_lsh_ctes(num_hashes=16, band_size=4, n=3)}
        SELECT id_a, id_b FROM cand
    """

    # benchmark decontamination: exact shared-shingle counts between the
    # corpus split and the 4% "eval set" split, containment = shared /
    # benchmark-doc shingles
    _u_contam = sampling.uniform_expr("doc_id", "contam", dialect="duckdb")
    o["dedup_contamination"] = f"""
        WITH {_TOKS},
        sh AS (
            SELECT doc_id AS id, unnest(
                list_distinct(list_transform(range(greatest(len(t) - 3, -1) + 1),
                              i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')))
            ) AS shingle
            FROM toks
        ),
        bench AS (SELECT doc_id FROM documents WHERE {_u_contam} >= 0.96),
        bsh AS (SELECT s.id AS bench_id, s.shingle
                FROM sh s JOIN bench b ON b.doc_id = s.id),
        csh AS (SELECT * FROM sh
                WHERE id NOT IN (SELECT doc_id FROM bench)),
        bsz AS (SELECT bench_id, count(*)::BIGINT AS n_bench
                FROM bsh GROUP BY bench_id),
        hits AS (SELECT c.id, b.bench_id, count(*)::BIGINT AS n_shared
                 FROM csh c JOIN bsh b USING (shingle)
                 GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT id, bench_id, n_shared,
               round(n_shared / n_bench, 6) AS containment
        FROM hits JOIN bsz USING (bench_id)
    """

    # incremental-ingestion dedup: same LSH family over the FULL corpus,
    # restricted to pairs with >=1 member in the 20% "new batch" hash
    # split; est_jaccard = fraction of agreeing minhash slots (exact
    # int64 arithmetic in both engines, k/16 exactly representable)
    # exact duplicated spans: the same gram-fingerprint -> cross-doc
    # frequency -> run-merge pipeline relationally (sha256 is the
    # engine-portable fingerprint; run-id = lag/cumsum window parity)
    _span_ctes = r"""
        stk AS (
            SELECT doc_id, list_filter(
                       regexp_split_to_array(coalesce(text, ''),
                                             '[ \t\n\x0b\f\r]+'),
                       x -> x != '') AS tk
            FROM documents
        ),
        sg AS (
            SELECT doc_id, p,
                   substr(sha256(array_to_string(tk[p + 1 : p + 8], ' ')),
                          1, 32) AS gh
            FROM (SELECT doc_id, tk,
                         unnest(generate_series(0, len(tk) - 8)) AS p
                  FROM stk WHERE len(tk) >= 8)
        ),
        sdup AS (SELECT gh FROM sg GROUP BY gh
                 HAVING COUNT(DISTINCT doc_id) >= 2),
        spos AS (SELECT doc_id, p FROM sg JOIN sdup USING (gh)),
        sruns AS (
            SELECT doc_id, p,
                   SUM(CASE WHEN prev IS NULL OR p - prev > 8
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY p) AS run
            FROM (SELECT doc_id, p,
                         lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
                  FROM spos)
        ),
        sspans AS (
            SELECT doc_id, MIN(p)::BIGINT AS start_tok,
                   (MAX(p) + 8)::BIGINT AS end_tok,
                   (MAX(p) + 8 - MIN(p))::BIGINT AS n_tokens
            FROM sruns GROUP BY doc_id, run
        )"""
    o["dedup_spans"] = f"""
        WITH {_span_ctes}
        SELECT doc_id AS id, start_tok, end_tok, n_tokens FROM sspans
    """

    o["dedup_span_stats"] = f"""
        WITH {_span_ctes},
        per_doc AS (SELECT doc_id, SUM(n_tokens)::BIGINT AS n_dup
                    FROM sspans GROUP BY doc_id)
        SELECT t.doc_id AS id, len(t.tk)::BIGINT AS n_ws_tokens,
               COALESCE(p.n_dup, 0)::BIGINT AS n_dup_tokens,
               round(COALESCE(p.n_dup, 0)
                     / greatest(len(t.tk), 1), 6) AS dup_frac
        FROM stk t LEFT JOIN per_doc p ON p.doc_id = t.doc_id
    """

    o["dedup_span_cut"] = f"""
        WITH {_span_ctes},
        tokpos AS (
            SELECT doc_id, p, tk[p + 1] AS tok
            FROM (SELECT doc_id, tk,
                         unnest(generate_series(0, len(tk) - 1)) AS p
                  FROM stk WHERE len(tk) > 0)
        ),
        sckept AS (
            SELECT t.doc_id, t.p, t.tok
            FROM tokpos t
            LEFT JOIN sspans s ON s.doc_id = t.doc_id
                 AND t.p >= s.start_tok AND t.p < s.end_tok
            WHERE s.doc_id IS NULL
        ),
        agg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
                   COUNT(*)::BIGINT AS n_kept
            FROM sckept GROUP BY doc_id
        )
        SELECT t.doc_id AS id, COALESCE(a.clean_text, '') AS clean_text,
               COALESCE(a.n_kept, 0)::BIGINT AS n_kept_tokens,
               (len(t.tk) - COALESCE(a.n_kept, 0))::BIGINT
                   AS n_removed_tokens
        FROM stk t LEFT JOIN agg a ON a.doc_id = t.doc_id
    """

    _u_mix = sampling.uniform_expr("doc_id", "mix", dialect="duckdb")
    o["sample_token_mix"] = f"""
        WITH base AS (
            SELECT doc_id AS id, lang AS stratum,
                   len(list_filter(
                       regexp_split_to_array(coalesce(text, ''),
                                             '[ \\t\\n\\x0b\\f\\r]+'),
                       x -> x != ''))::BIGINT AS n_tokens,
                   {_u_mix} AS u
            FROM documents WHERE lang IN ('en', 'de', 'fr')
        ),
        c AS (
            SELECT id, stratum, n_tokens,
                   (SUM(n_tokens) OVER (PARTITION BY stratum
                                        ORDER BY u, id)
                    - n_tokens)::BIGINT AS cum_before
            FROM base
        )
        SELECT id, stratum, n_tokens, cum_before,
               cum_before < CASE stratum WHEN 'en' THEN 5000
                                         WHEN 'de' THEN 1500
                                         ELSE 4000 END AS kept
        FROM c
    """

    _u_new = sampling.uniform_expr("doc_id", "inc-dd", dialect="duckdb")
    _slots16 = " + ".join(
        f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(16))
    o["dedup_incremental"] = f"""
        WITH {_TOKS},
        {_minhash_lsh_ctes(num_hashes=16, band_size=4, n=3)},
        newdocs AS (SELECT doc_id AS id FROM documents WHERE {_u_new} >= 0.8)
        SELECT id_a, id_b, round(({_slots16}) / 16.0, 6) AS est_jaccard
        FROM cand
        JOIN mins a ON a.id = id_a
        JOIN mins b ON b.id = id_b
        WHERE id_a IN (SELECT id FROM newdocs)
           OR id_b IN (SELECT id FROM newdocs)
    """

    o["dedup_near"] = f"""
        WITH {_TOKS},
        {_minhash_lsh_ctes(num_hashes=64, band_size=8, n=3)},
        sizes AS (SELECT id, count(*)::BIGINT AS n_sh FROM sh GROUP BY id),
        inter AS (
            SELECT id_a, id_b, count(*)::BIGINT AS i
            FROM cand
            JOIN sh a ON a.id = id_a
            JOIN sh b ON b.id = id_b AND b.feature = a.feature
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.8
    """

    # shared simhash CTE chain: shs(id, simhash) — used by the signature
    # gate and the Hamming-pairing gate
    _SIMHASH_CTES = """
        tf AS (
            SELECT doc_id AS id, term, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)
            GROUP BY 1, 2
        ),
        th AS (SELECT id, tf, substr(sha256(term), 1, 16) AS h FROM tf),
        bits AS (
            SELECT id, bb.b AS b,
                   sum(tf * (2 * (((strpos('0123456789abcdef',
                                   substr(h, (bb.b // 4)::INT + 1, 1)) - 1)
                                  // CAST(pow(2, 3 - bb.b % 4) AS INT)) % 2) - 1)) AS s
            FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bb
            GROUP BY id, bb.b
        ),
        shs AS (
            SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
            FROM bits GROUP BY id
        )"""

    o["dedup_simhash"] = f"""
        WITH {_TOKS},
        {_SIMHASH_CTES}
        SELECT id, simhash FROM shs
    """

    # all-pairs Hamming oracle: the Spark side runs the block-banded
    # plan (pigeonhole-complete candidate cover), so gate equality is an
    # empirical completeness check of the banding on top of unit tests
    o["dedup_simhash_pairs"] = f"""
        WITH {_TOKS},
        {_SIMHASH_CTES},
        pr AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   list_sum(list_transform(range(64),
                            i -> CASE WHEN a.simhash[i + 1] = b.simhash[i + 1]
                                      THEN 0 ELSE 1 END))::BIGINT AS hamming
            FROM shs a JOIN shs b ON a.id < b.id
        )
        SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 6
    """

    o["text_token_counts"] = f"""
        WITH {_TOKS}
        SELECT d.doc_id AS id,
               len(list_filter(regexp_split_to_array(d.text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x != ''))::BIGINT AS n_ws_tokens,
               len(t)::BIGINT AS n_terms,
               len(list_distinct(t))::BIGINT AS n_distinct_terms,
               length(d.text)::BIGINT AS n_chars
        FROM documents d JOIN toks ON toks.doc_id = d.doc_id
    """

    en = "', '".join(textstats.LANG_PROFILES["en"])
    de = "', '".join(textstats.LANG_PROFILES["de"])
    fr = "', '".join(textstats.LANG_PROFILES["fr"])
    o["text_language_id"] = f"""
        WITH {_TOKS},
        s AS (
            SELECT doc_id AS id,
                   len(list_filter(t, x -> x IN ('{en}'))) / greatest(len(t), 1) AS s_en,
                   len(list_filter(t, x -> x IN ('{de}'))) / greatest(len(t), 1) AS s_de,
                   len(list_filter(t, x -> x IN ('{fr}'))) / greatest(len(t), 1) AS s_fr
            FROM toks
        )
        SELECT id,
               CASE WHEN greatest(s_en, s_de, s_fr) <= 0 THEN 'unknown'
                    WHEN s_en = greatest(s_en, s_de, s_fr) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_fr) THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM s
    """

    stop = "', '".join(textstats.STOPWORDS)
    o["text_quality_scores"] = f"""
        WITH {_TOKS}
        SELECT d.doc_id AS id,
               round(0.4 * least(1.0, len(t) / 50.0)
                     + 0.3 * (1.0 - length(regexp_replace(d.text, '[A-Za-z0-9_\\s]', '', 'g'))
                              / greatest(length(d.text), 1))
                     + 0.3 * least(1.0, 5.0 * (len(list_filter(t, x -> x IN ('{stop}')))
                                               / greatest(len(t), 1))), 6) AS quality
        FROM documents d JOIN toks ON toks.doc_id = d.doc_id
    """

    # per-language quality selection: the quality CTE is the
    # text_quality_scores oracle verbatim; the cut replays the engine's
    # window (rank by quality desc, id asc; group count; float64
    # ceil(0.3 * cnt))
    o["curation_top_quality"] = f"""
        WITH {_TOKS},
        q AS (
            SELECT d.doc_id AS id, d.lang,
                   round(0.4 * least(1.0, len(t) / 50.0)
                         + 0.3 * (1.0 - length(regexp_replace(d.text, '[A-Za-z0-9_\\s]', '', 'g'))
                                  / greatest(length(d.text), 1))
                         + 0.3 * least(1.0, 5.0 * (len(list_filter(t, x -> x IN ('{stop}')))
                                                   / greatest(len(t), 1))), 6) AS quality
            FROM documents d JOIN toks ON toks.doc_id = d.doc_id),
        r AS (SELECT *, row_number() OVER
                  (PARTITION BY lang ORDER BY quality DESC, id) AS rnk,
               count(*) OVER (PARTITION BY lang) AS cnt FROM q)
        SELECT id AS doc_id, lang, quality
        FROM r WHERE rnk <= ceil(0.3 * cnt)
    """

    o["text_repetition"] = f"""
        WITH {_TOKS},
        ln AS (
            SELECT d.doc_id AS id,
                   list_filter(string_split(d.text, chr(10)),
                               x -> trim(x) != '') AS ls,
                   t
            FROM documents d JOIN toks ON toks.doc_id = d.doc_id
        )
        SELECT id,
               round(CASE WHEN len(ls) > 0
                          THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)
                          ELSE 0.0 END, 6) AS dup_line_frac,
               round(CASE WHEN len(t) - 2 > 0
                          THEN 1.0 - len(list_distinct(list_transform(
                                   range(len(t) - 2),
                                   i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))))::DOUBLE
                               / (len(t) - 2)
                          ELSE 0.0 END, 6) AS dup_ngram_frac
        FROM ln
    """

    o["text_fingerprints"] = f"""
        WITH {_TOKS}
        SELECT doc_id AS id,
               list_min(list_transform(range(greatest(len(t) - 5, 0) + 1),
                        i -> sha256(array_to_string(list_slice(t, i + 1, i + 5), ' ')))) AS fingerprint
        FROM toks
    """

    # composed curation decision: each component relation IS the
    # already-verified standalone oracle, embedded as a nested-WITH
    # subquery — the reason CASE mirrors curation_report's first-fail
    # order exactly
    o["curation_report"] = f"""
        WITH lang AS ({o["text_language_id"]}),
        tok AS ({o["text_token_counts"]}),
        qual AS ({o["text_quality_scores"]}),
        rep AS ({o["text_repetition"]}),
        j AS (
            SELECT lang.id, lang.pred_lang, tok.n_ws_tokens,
                   qual.quality, rep.dup_line_frac, rep.dup_ngram_frac
            FROM lang JOIN tok USING (id) JOIN qual USING (id)
                      JOIN rep USING (id)
        ),
        r AS (
            SELECT *, CASE WHEN pred_lang != 'en' THEN 'language'
                           WHEN n_ws_tokens < 30 THEN 'too_short'
                           WHEN quality < 0.7 THEN 'low_quality'
                           WHEN dup_line_frac > 0.2
                                OR dup_ngram_frac > 0.05 THEN 'repetition'
                           ELSE 'ok' END AS reason
            FROM j
        )
        SELECT id, (reason = 'ok') AS kept, reason, pred_lang,
               n_ws_tokens, quality, dup_line_frac, dup_ngram_frac
        FROM r
    """

    o["text_unigram_logprob"] = f"""
        WITH {_TOKS},
        tfd AS (
            SELECT doc_id AS id, term, count(*)::BIGINT AS c
            FROM (SELECT doc_id, unnest(t) AS term FROM toks)
            GROUP BY 1, 2
        ),
        cf AS (SELECT term, sum(c)::BIGINT AS cf FROM tfd GROUP BY term),
        tot AS (SELECT sum(cf)::DOUBLE AS T FROM cf)
        SELECT id,
               round(sum(c * ln(cf / T)) / sum(c), 6) AS mean_logprob,
               sum(c)::BIGINT AS n_terms
        FROM tfd JOIN cf USING (term) CROSS JOIN tot
        GROUP BY id
    """

    # CCNet-style bigram-LM filter: the model (reference-split counts,
    # interpolation, add-one floor) replayed relationally; the float
    # formula text matches the Spark expression term for term
    _u_lm = sampling.uniform_expr("doc_id", "lmref", dialect="duckdb")
    o["text_lm_bigram"] = f"""
        WITH {_TOKS},
        bg AS (
            SELECT id, u, v, count(*)::BIGINT AS m FROM (
                SELECT doc_id AS id, t[i] AS u, t[i + 1] AS v
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 1)) AS i
                      FROM toks WHERE len(t) >= 2)
            ) GROUP BY 1, 2, 3
        ),
        ref AS (SELECT doc_id, t FROM toks WHERE {_u_lm} < 0.5),
        c1 AS (SELECT term, count(*)::BIGINT AS c1
               FROM (SELECT unnest(t) AS term FROM ref) GROUP BY term),
        c2 AS (
            SELECT u, v, count(*)::BIGINT AS c2 FROM (
                SELECT t[i] AS u, t[i + 1] AS v
                FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                      FROM ref WHERE len(t) >= 2)
            ) GROUP BY 1, 2
        ),
        st AS (SELECT sum(c1)::DOUBLE AS ref_t,
                      count(*)::DOUBLE AS ref_v FROM c1)
        SELECT id,
               round(sum(m * ln(0.9 * coalesce(c2 / c1u.c1, 0)
                                + (1 - 0.9) * ((coalesce(c1v.c1, 0) + 1)
                                               / (ref_t + ref_v + 1)))) / sum(m),
                     6) AS mean_logprob,
               sum(m)::BIGINT AS n_bigrams
        FROM bg LEFT JOIN c2 USING (u, v)
                LEFT JOIN c1 c1u ON c1u.term = bg.u
                LEFT JOIN c1 c1v ON c1v.term = bg.v
                CROSS JOIN st
        GROUP BY id
    """

    # corpus bigram top-20: consecutive-position self-join over the
    # tokenizer CTE, same (count desc, ngram) deterministic cut
    pii_em = textstats.PII_PATTERNS["email"]
    pii_ip = textstats.PII_PATTERNS["ipv4"]
    o["text_pii"] = f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' mail ' || source || '@corp.example.com node 10.1.'
                        || (doc_id % 200)::VARCHAR || '.42 decoy 1234.5.6.7'
                   AS text
            FROM documents
        )
        SELECT doc_id AS id,
               len(regexp_extract_all(coalesce(text, ''), '{pii_em}'))::BIGINT AS n_email,
               len(regexp_extract_all(coalesce(text, ''), '{pii_ip}'))::BIGINT AS n_ipv4,
               regexp_replace(regexp_replace(text, '{pii_em}', '<EMAIL>', 'g'),
                              '{pii_ip}', '<IPV4>', 'g') AS text_redacted
        FROM aug
    """

    bpe_pat = textstats.BPE_PRETOKEN_PATTERN.replace("'", "''")
    o["text_bpe_pieces"] = f"""
        SELECT doc_id AS id,
               len(regexp_extract_all(coalesce(text, ''), '{bpe_pat}'))::BIGINT
                   AS n_pieces,
               len(list_filter(
                   regexp_extract_all(coalesce(text, ''), '{bpe_pat}'),
                   x -> NOT regexp_full_match(x, '[ \\t\\n\\x0b\\f\\r]+')
               ))::BIGINT AS n_nonspace_pieces
        FROM documents
    """

    o["text_chunks"] = r"""
        WITH t AS (
            SELECT doc_id, list_filter(
                       regexp_split_to_array(coalesce(text, ''),
                                             '[ \t\n\x0b\f\r]+'),
                       x -> x != '') AS toks
            FROM documents
        ),
        ex AS (
            SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 1, 48)) AS start_tok
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id AS id,
               (start_tok // 48)::BIGINT AS chunk_id,
               start_tok::BIGINT AS start_tok,
               len(toks[start_tok + 1 : start_tok + 64])::BIGINT AS n_tokens,
               array_to_string(toks[start_tok + 1 : start_tok + 64], ' ')
                   AS chunk_text
        FROM ex
    """

    # BPE tokenizer training replayed exactly in SQL: the word
    # dictionary, pair statistics, pinned tie-break and greedy-leftmost
    # re-segmentation are all engine-portable integer/string ops
    o["text_bpe_pairs"] = f"""
        WITH {_bpe_train_ctes(1)}
        SELECT "left", "right", cnt AS count
        FROM (SELECT l AS "left", r2 AS "right", SUM(freq)::BIGINT AS cnt
              FROM (SELECT sym AS l,
                           lead(sym) OVER (PARTITION BY word
                                           ORDER BY pos) AS r2, freq
                    FROM seg1)
              WHERE r2 IS NOT NULL GROUP BY 1, 2)
        ORDER BY cnt DESC, "left", "right" LIMIT 20
    """

    bpe_union = "\n        UNION ALL ".join(
        f'SELECT {r} AS merge_rank, "left", "right", cnt AS pair_count '
        f"FROM b{r}" for r in range(1, 7))
    o["text_bpe_merges"] = f"""
        WITH {_bpe_train_ctes(6)}
        {bpe_union}
    """

    o["text_bpe_encode"] = f"""
        WITH {_bpe_train_ctes(6, final_seg=True)},
        wp AS (SELECT word, COUNT(*)::BIGINT AS n_pieces
               FROM seg7 GROUP BY word),
        docw AS (
            SELECT doc_id AS id, unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''),
                                      '[ \\t\\n\\x0b\\f\\r]+'),
                x -> x != '')) AS word
            FROM documents
        ),
        per_doc AS (
            SELECT id, SUM(n_pieces)::BIGINT AS n
            FROM docw JOIN wp USING (word) GROUP BY id
        )
        SELECT d.doc_id AS id, COALESCE(p.n, 0)::BIGINT AS n_bpe_pieces
        FROM documents d LEFT JOIN per_doc p ON p.id = d.doc_id
    """

    # trigram-grep gates: the index only changes what is scanned, so
    # the oracle is the plain full-scan predicate; occurrence counts
    # use the engine-portable replace-shrink formula / RE2 extract_all
    o["code_grep"] = """
        SELECT doc_id AS id,
               ((length(text) - length(replace(text, 'sort table', '')))
                / length('sort table'))::BIGINT AS n_hits
        FROM documents WHERE position('sort table' IN text) > 0
    """

    o["code_grep_regex"] = """
        SELECT doc_id AS id,
               len(regexp_extract_all(text, 's(ort|can) table'))::BIGINT
                   AS n_hits
        FROM documents WHERE regexp_matches(text, 's(ort|can) table')
    """

    o["text_top_bigrams"] = f"""
        WITH {_TOKS}, {_POS}
        SELECT a.term || ' ' || b.term AS ngram, count(*)::BIGINT AS n
        FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
        GROUP BY ngram
        ORDER BY n DESC, ngram LIMIT 20
    """

    # PMI collocations: same adjacency relation as text_top_bigrams,
    # scored ln(n_xy*N_uni*N_uni / (N_big*c_x*c_y)) with ONE literal
    # operand order on both engines, rounded before the cut
    o["text_pmi_bigrams"] = f"""
        WITH {_TOKS}, {_EX}, {_POS},
        uni AS (SELECT term, count(*)::BIGINT AS c FROM ex GROUP BY term),
        big AS (SELECT a.term AS x, b.term AS y, count(*)::BIGINT AS n_xy
                FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
                GROUP BY a.term, b.term),
        tot AS (SELECT (SELECT sum(c)::DOUBLE FROM uni) AS n_uni,
                       (SELECT sum(n_xy)::DOUBLE FROM big) AS n_big),
        scored AS (
            SELECT big.x || ' ' || big.y AS ngram, big.n_xy,
                   round(ln((big.n_xy::DOUBLE * tot.n_uni * tot.n_uni)
                            / (tot.n_big * ux.c * uy.c)), 6) AS pmi
            FROM big
            JOIN uni ux ON ux.term = big.x
            JOIN uni uy ON uy.term = big.y
            CROSS JOIN tot
            WHERE big.n_xy >= 3)
        SELECT ngram, n_xy, pmi FROM scored
        ORDER BY pmi DESC, ngram LIMIT 20
    """

    o["ann_cosine_topk"] = """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        s AS (
            SELECT vec_id,
                   list_sum(list_transform(range(len(embedding)),
                            i -> embedding[i + 1]::DOUBLE * qv[i + 1]::DOUBLE))
                   / (greatest(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 1e-12)
                      * sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
            FROM embeddings CROSS JOIN q
        )
        SELECT vec_id, round(c, 6) AS cos
        FROM s ORDER BY c DESC, vec_id LIMIT 10
    """

    # ann_lsh_topk / ann_lsh_candidates: the signature is a bit-reproducible
    # SQL expression (similarity.signature_expr), so the approximate
    # operator admits an EXACT DuckDB oracle (round 1 had rows-only here)
    from information_retrieval_spark.similarity import _planes, signature_expr

    planes = _planes(64, 8, 42)  # testdata embeddings are 64-dim
    sig_e = signature_expr(planes, "embedding", dialect="duckdb")
    sig_q = signature_expr(planes, "qv", dialect="duckdb")
    probes = " UNION ALL ".join(
        ["SELECT s FROM qs"] + [f"SELECT xor(s, {1 << b}) FROM qs" for b in range(8)])
    _ANN_CAND = f"""
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qs AS (SELECT {sig_q} AS s FROM q),
        probes AS ({probes}),
        sigs AS (SELECT vec_id, {sig_e} AS sig FROM embeddings),
        cand AS (
            SELECT e.vec_id, e.embedding, sigs.sig
            FROM embeddings e JOIN sigs USING (vec_id)
            WHERE sig IN (SELECT s FROM probes)
        )"""

    def _hexbyte(col: str, j: int) -> str:
        # byte j of a sha256 hex string as an integer
        a = f"(strpos('0123456789abcdef', substr({col}, {2 * j + 1}, 1)) - 1)"
        b = f"(strpos('0123456789abcdef', substr({col}, {2 * j + 2}, 1)) - 1)"
        return f"({a} * 16 + {b})::BIGINT"

    o["multimodal_features"] = f"""
        WITH m AS (
            SELECT doc_id AS id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
                   octet_length(encode(text))::BIGINT AS n_bytes,
                   sha256(text) AS payload_sha
            FROM documents
        )
        SELECT id, media_type, n_bytes, payload_sha,
               {_hexbyte('payload_sha', 0)} AS b0,
               {_hexbyte('payload_sha', 15)} AS b15
        FROM m
    """

    o["multimodal_frames"] = """
        SELECT doc_id AS id,
               unnest(range(0, greatest(n_chars - 1, 0) + 1, 500))::BIGINT AS frame_ts
        FROM documents
    """

    probe_list = ", ".join(["sig"] + [f"xor(sig, {1 << b})" for b in range(8)])
    o["ann_near_dup"] = f"""
        WITH sigs AS (SELECT vec_id, embedding, {sig_e} AS sig FROM embeddings),
        pr AS (SELECT vec_id, unnest([{probe_list}]) AS probe FROM sigs),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM sigs a JOIN pr b ON a.sig = b.probe
            WHERE a.vec_id < b.vec_id
        ),
        pairs AS (
            SELECT id_a, id_b, ea.embedding AS va, eb.embedding AS vb
            FROM cand
            JOIN embeddings ea ON ea.vec_id = id_a
            JOIN embeddings eb ON eb.vec_id = id_b
        ),
        scored AS (
            SELECT id_a, id_b,
                   list_sum(list_transform(range(len(va)),
                            i -> va[i + 1]::DOUBLE * vb[i + 1]::DOUBLE))
                   / (greatest(sqrt(list_sum(list_transform(va, x -> x::DOUBLE * x::DOUBLE))), 1e-12)
                      * greatest(sqrt(list_sum(list_transform(vb, x -> x::DOUBLE * x::DOUBLE))), 1e-12)) AS c
            FROM pairs
        )
        SELECT id_a, id_b, round(c, 6) AS cos
        FROM scored WHERE c >= 0.4
    """

    o["ann_lsh_candidates"] = f"""
        WITH {_ANN_CAND}
        SELECT vec_id, sig FROM cand ORDER BY vec_id
    """

    o["ann_lsh_topk"] = f"""
        WITH {_ANN_CAND},
        s AS (
            SELECT vec_id,
                   list_sum(list_transform(range(len(embedding)),
                            i -> embedding[i + 1]::DOUBLE * qv[i + 1]::DOUBLE))
                   / (greatest(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 1e-12)
                      * sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
            FROM cand CROSS JOIN q
        )
        SELECT vec_id, round(c, 6) AS cos
        FROM s ORDER BY c DESC, vec_id LIMIT 10
    """

    # banded multi-table ANN: 16 independent 8-bit signature tables,
    # candidate iff Hamming(sig_t, qsig_t) <= 1 in ANY table — i.e.
    # xor(s_t, q_t) is 0 or a single bit. Same fold-expression trick
    # per table, so the multi-table operator keeps an exact oracle.
    from information_retrieval_spark.similarity import _banded_planes

    bp = _banded_planes(64, 16, 8, 42)
    sig_cols = ",\n               ".join(
        f"{signature_expr(bp[t], 'embedding', dialect='duckdb')} AS s{t}"
        for t in range(16))
    qsig_cols = ",\n               ".join(
        f"{signature_expr(bp[t], 'qv', dialect='duckdb')} AS q{t}"
        for t in range(16))
    ham1 = "(0, 1, 2, 4, 8, 16, 32, 64, 128)"
    any_table = " OR ".join(f"xor(s{t}, q{t}) IN {ham1}" for t in range(16))
    o["ann_banded_topk"] = f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qs AS (SELECT {qsig_cols} FROM q),
        sigs AS (SELECT vec_id, embedding, {sig_cols} FROM embeddings),
        cand AS (
            SELECT vec_id, embedding FROM sigs CROSS JOIN qs
            WHERE {any_table}
        ),
        s AS (
            SELECT vec_id,
                   list_sum(list_transform(range(len(embedding)),
                            i -> embedding[i + 1]::DOUBLE * qv[i + 1]::DOUBLE))
                   / (greatest(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 1e-12)
                      * sqrt(list_sum(list_transform(qv, x -> x::DOUBLE * x::DOUBLE)))) AS c
            FROM cand CROSS JOIN q
        )
        SELECT vec_id, round(c, 6) AS cos
        FROM s ORDER BY c DESC, vec_id LIMIT 10
    """

    o["ann_ivf_topk"] = _ivf_oracle_sql(n_lists=8, iters=2, nprobe=2,
                                        k=10, dim=64, train_rate=0.5)

    o["ann_semdedup_pairs"] = _semdedup_oracle_sql(
        n_lists=8, iters=2, dim=64, threshold=0.4, train_rate=0.5)

    u1 = sampling.uniform_expr("doc_id", "s1", dialect="duckdb")
    u2 = sampling.uniform_expr("doc_id", "s2", dialect="duckdb")
    o["sample_split"] = f"""
        SELECT doc_id AS id, lang,
               CASE WHEN {u2} < 0.25 THEN 'val' ELSE 'train' END AS split
        FROM documents
        WHERE {u1} < (CASE lang WHEN 'en' THEN 0.5
                                WHEN 'de' THEN 0.3 ELSE 0.2 END)
    """

    # connected components over the dedup_near pair set: transitive
    # closure via recursive CTE (fine at oracle scale; the Spark side
    # runs large-star/small-star, which needs no closure table).
    # Shared by dedup_clusters and dedup_canonical.
    _cluster_ctes = f"""
        WITH RECURSIVE {_TOKS},
        {_minhash_lsh_ctes(num_hashes=64, band_size=8, n=3)},
        sizes AS (SELECT id, count(*)::BIGINT AS n_sh FROM sh GROUP BY id),
        inter AS (
            SELECT id_a, id_b, count(*)::BIGINT AS i
            FROM cand
            JOIN sh a ON a.id = id_a
            JOIN sh b ON b.id = id_b AND b.feature = a.feature
            GROUP BY 1, 2
        ),
        dup_pairs AS (
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.8
        ),
        edges AS (
            SELECT id_a AS ea, id_b AS eb FROM dup_pairs
            UNION
            SELECT id_b, id_a FROM dup_pairs
        ),
        reach(src, node) AS (
            SELECT ea, ea FROM edges
            UNION
            SELECT r.src, e.eb FROM reach r JOIN edges e ON e.ea = r.node
        ),
        comp AS (SELECT src AS id, min(node) AS cluster_id
                 FROM reach GROUP BY src)"""

    o["dedup_clusters"] = f"""
        {_cluster_ctes},
        csize AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                  FROM comp GROUP BY cluster_id)
        SELECT comp.id, comp.cluster_id, csize.cluster_size
        FROM comp JOIN csize USING (cluster_id)
    """

    # canonical selection: highest round-6 quality per cluster (the
    # SAME quality expression as the text_quality_scores oracle — the
    # rounding grain makes the cross-engine argmax deterministic),
    # ties broken by smallest id
    o["dedup_canonical"] = f"""
        {_cluster_ctes},
        qual AS (
            SELECT d.doc_id AS id,
                   round(0.4 * least(1.0, len(t) / 50.0)
                         + 0.3 * (1.0 - length(regexp_replace(d.text, '[A-Za-z0-9_\\s]', '', 'g'))
                                  / greatest(length(d.text), 1))
                         + 0.3 * least(1.0, 5.0 * (len(list_filter(t, x -> x IN ('{stop}')))
                                                   / greatest(len(t), 1))), 6) AS quality
            FROM documents d JOIN toks ON toks.doc_id = d.doc_id
        )
        SELECT comp.id, comp.cluster_id,
               (row_number() OVER (PARTITION BY comp.cluster_id
                                   ORDER BY qual.quality DESC, comp.id)
                = 1) AS is_canonical
        FROM comp JOIN qual ON qual.id = comp.id
    """

    # filtered BM25: exact top-10 OF the lang='en' subcorpus — the
    # filter is applied BEFORE the LIMIT, same as the kernel mask
    o["bm25_filtered"] = f"""
        WITH {_TOKS},
        {_bm25_ctes()}
        SELECT scores.doc_id, round(s, 6) AS score
        FROM scores JOIN documents d ON d.doc_id = scores.doc_id
        WHERE d.lang = 'en'
        ORDER BY s DESC, scores.doc_id LIMIT 10
    """

    o["bm25_phrase"] = f"""
        WITH {_TOKS}, {_POS},
        ph AS (
            SELECT DISTINCT a.doc_id
            FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
            WHERE a.term = 'table' AND b.term = 'merge'
        ),
        {_bm25_ctes()}
        SELECT scores.doc_id, round(s, 6) AS score
        FROM scores JOIN ph ON ph.doc_id = scores.doc_id
        ORDER BY s DESC, scores.doc_id LIMIT 10
    """

    # token-budget sharding: the window formulation the Spark side
    # refuses to run (its two-phase prefix sum has no global sort);
    # integer // matches Spark's DIV exactly at any magnitude
    o["shard_tokens"] = """
        WITH tc AS (
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), x -> x != ''))::BIGINT AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0)::BIGINT AS bf
            FROM tc
        )
        SELECT doc_id, n_tokens, (bf // 4096)::BIGINT AS shard FROM c
    """
    # the end-to-end pipeline: each stage IS its already-verified
    # oracle, embedded whole; the span-cut stage's source relation is
    # retargeted from the corpus to the curation survivors
    o["pipeline_curate"] = f"""
        WITH cur AS ({o["curation_report"]}),
        keptdocs AS (
            SELECT d.* FROM documents d
            JOIN cur ON cur.id = d.doc_id AND cur.kept
        ),
        cutrel AS ({o["dedup_span_cut"].replace("FROM documents",
                                                "FROM keptdocs")})
        SELECT cur.id, cur.reason AS stage_reason,
               cur.n_ws_tokens AS n_tokens_in,
               COALESCE(cutrel.n_kept_tokens, 0)::BIGINT AS n_tokens_out
        FROM cur LEFT JOIN cutrel ON cutrel.id = cur.id
    """


    return o
