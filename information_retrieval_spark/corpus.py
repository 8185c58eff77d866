"""Corpus sources for the engine.

The authoritative input shape (BASELINE.json ``input_hint``) is an
Iceberg table of source-code repositories:

    documents(repo:string, path:string, commit:string, lang:string, content:string)

Three sources produce that shape:

1. `fixture_docs`      — the reference's five golden test documents
                         (src/test/java/ukma/ir/testing_files/, reproduced
                         in FIXTURES.md §2), as rows.
2. `synthetic_corpus`  — deterministic seeded generator (FIXTURES.md §1):
                         a source-code-ish token stream with a Zipf head,
                         digit-bearing long tokens that the admission
                         filter must drop, and planted phrases.
3. `load_testdata_documents` — the driver's /root/testdata documents
                         parquet (doc_id, text, lang, source, n_chars)
                         mapped into the input_hint shape
                         (repo=source, path=str(doc_id), content=text).

Iceberg note: the sandbox has no iceberg-spark-runtime jar, so tables
read/write parquet through io.py's TableStore with an identical layout;
the Iceberg catalog is enabled by config when the jar is present
(SURVEY.md §7 risks).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "repo string, path string, commit string, lang string, content string"

# Reference fixture docs, verbatim (FIXTURES.md §2; 363 bytes total).
FIXTURE_DOCS = {
    "test1.txt": "pen pineapple\napple pen \t\nunusuallylongwordaddedintentionally\n\npen pineapple apple pen unusuallylongwordaddedintentionally",
    "test2.txt": "more complex phrase for searching unusuallylongwordaddedintentionally",
    "test3.txt": "trigger word for indexing and debugging updated search engine for for for searching fell",
    "test4.txt": "SAZ fell must trigger for second word and 'already'",
    "test5.txt": "engine keyword in testing purpose",
}


def _sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def fixture_docs(spark: SparkSession) -> DataFrame:
    rows = [
        ("ref/testing_files", name, _sha256("commit" + name)[:40], "txt", content)
        for name, content in sorted(FIXTURE_DOCS.items())
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


_LANGS = ["java", "py", "txt", "md", "c"]
_EXT = {"java": "java", "py": "py", "txt": "txt", "md": "md", "c": "c"}

# 500-word seeded vocabulary + Zipf-ish head words (the reference does NOT
# stop-filter, IndexService has no stopword use — so head terms stay).
_HEAD = ["the", "for", "and", "int", "return", "if", "else", "void", "new", "public"]


def synthetic_corpus(spark: SparkSession, n_docs: int = 1000, seed: int = 42,
                     avg_tokens: int = 120) -> DataFrame:
    """Deterministic synthetic source-code corpus per FIXTURES.md §1."""
    rng = random.Random(seed)
    vocab = [f"sym{v}" for v in range(500)]
    rows = []
    for i in range(n_docs):
        lang = _LANGS[i % len(_LANGS)]
        n = max(5, int(rng.gauss(avg_tokens, avg_tokens / 4)))
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.35:
                toks.append(_HEAD[int(rng.random() ** 2 * len(_HEAD))])
            elif r < 0.95:
                # Zipf-ish vocabulary draw
                toks.append(vocab[min(499, int(rng.paretovariate(1.2)) - 1)])
            elif r < 0.98:
                # digit-bearing long token (>=12 chars) — must be DROPPED
                toks.append(hashlib.sha256(f"blob{i}{rng.random()}".encode()).hexdigest()[:16])
            else:
                toks.append(f"v{rng.randrange(100)}")  # short code, kept
        if rng.random() < 0.3:
            toks.extend(["needle", "haystack"])  # planted phrase for positional tests
        content = " ".join(toks)
        rows.append((
            f"org{i % 7}/repo{i % 23}",
            f"src/dir{i % 11}/file{i}.{_EXT[lang]}",
            hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40],
            lang,
            content,
        ))
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def synthetic_corpus_distributed(spark: SparkSession, n_docs: int = 100_000,
                                 seed: int = 42, avg_tokens: int = 400,
                                 n_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic corpus generated ON THE EXECUTORS.

    Each document's RNG is keyed by (seed, doc index) — Philox counter
    streams — so the corpus is bit-identical regardless of partitioning
    or cluster size (the property the two-parallelism scaling benchmark
    depends on). This is the 10^12-file-scale generation path: no
    driver-side materialization.
    """
    import numpy as np
    import pandas as pd

    vocab = np.array([f"sym{v}" for v in range(500)], dtype=object)
    head = np.array(_HEAD, dtype=object)
    langs = np.array(_LANGS, dtype=object)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, i]))
                n = max(5, int(rng.normal(avg_tokens, avg_tokens / 4)))
                r = rng.random(n)
                zipf = np.minimum(rng.pareto(1.2, n).astype(np.int64), 499)
                headpick = head[(rng.random(n) ** 2 * len(head)).astype(np.int64)]
                toks = vocab[zipf]
                toks = np.where(r < 0.35, headpick, toks)
                long_mask = (r >= 0.95) & (r < 0.98)
                if long_mask.any():
                    import hashlib as _h
                    toks[long_mask] = [
                        _h.sha256(f"blob{i}{k}".encode()).hexdigest()[:16]
                        for k in np.flatnonzero(long_mask)]
                code_mask = r >= 0.98
                if code_mask.any():
                    toks[code_mask] = [f"v{v}" for v in
                                       rng.integers(0, 100, int(code_mask.sum()))]
                content = " ".join(toks)
                if rng.random() < 0.3:
                    content += " needle haystack"
                lang = langs[i % len(langs)]
                rows.append((
                    f"org{i % 7}/repo{i % 23}",
                    f"src/dir{i % 11}/file{i}.{_EXT[lang]}",
                    hashlib.sha256(f"commit{i}".encode()).hexdigest()[:40],
                    lang, content))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, n_partitions)
    return base.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def load_testdata_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents parquet into the input_hint shape.

    The scan is widened to the session's parallelism when the source
    packs into fewer splits: a single-file corpus under
    `spark.sql.files.maxPartitionBytes` otherwise scans as ONE task, and
    every downstream map-only operator (tokenize, quality, PII, ...)
    inherits that single partition — serializing a many-core box onto
    one thread. The round-robin exchange moves the corpus once (callers
    cache the result, so it is paid once per session); partitioning
    carries no semantics here — every operator is content-keyed.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = raw.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    par = spark.sparkContext.defaultParallelism
    if out.rdd.getNumPartitions() < par:
        out = out.repartition(par)
    return out


def with_sha256(df: DataFrame) -> DataFrame:
    """Per-row content fingerprint (input_hint invariant): vectorized builtin."""
    return df.withColumn("sha256", F.sha2(F.col("content"), 256))
