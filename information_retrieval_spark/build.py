"""SPIMI-style partition-parallel inverted-index build.

Pipeline (SURVEY.md §3.1 Spark lifecycle), each stage a checkpointed
table so the build is resumable (north_rule):

  stage 1  doc_map   — dense docID assignment over (repo, path) order
                       WITHOUT a global sort: range-repartition the slim
                       (repo, path) projection, sort within partitions,
                       then per-partition counts -> exclusive prefix sum
                       -> offset + local index. Only the two key columns
                       ever shuffle; content stays where it is.
                       (Replaces the reference's walk-order BiMap,
                       IndexService.java:173-177, which cannot distribute.)
  stage 2  partials  — docs ⋈ doc_map (AQE picks broadcast when small)
                       -> tokenize (pandas UDF or pure-SQL expr)
                       -> posexplode (positions over kept terms only)
                       -> groupBy(term, docID) partial+final hash agg
                       (tf, sorted positions, dl). This is SPIMI: the
                       map-side partial aggregation is the in-memory
                       inversion (IndexService.java:215-233), Spark's
                       sort/shuffle spill replaces hand-rolled particle
                       files (IndexService.java:258-288).
  stage 3  doc_len   — dl per doc (0 for docs with no kept terms) + global
           + stats     N / total_len / avgdl (needed by BM25 + block-max).
  stage 4  postings  — groupBy(term, bucket) -> numpy block encoder:
                       fixed docs-per-block varbyte blocks with gap-coded
                       docIDs/positions, per-block max tf and max BM25
                       tf-norm (the block-max WAND skip structure). The
                       `bucket = docID // docs_per_bucket` key bounds any
                       single group: a Zipf head term is split across
                       buckets (skew-proof, replaces the reference's
                       single-writer k-way merge, IndexService.java:290-419),
                       and bucket-major block ids keep docIDs globally
                       ascending per term.
  stage 5  dictionary— term stats rollup from block metadata (df is summed
                       from per-block doc counts — no docFr backpatch pass,
                       cf. IndexService.java:397-407) + reversed-term
                       column for suffix/joker lookups (IndexBody.java:142-162).
  stage 6  lineage   — per-stage, per-partition row counts + merge fan-in.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import vb_encode
from .corpus import with_sha256
from .functions.tokenize import spark_tokenize_col, tokenize_pandas_udf
from .io import TableStore

def _spimi_invert(batches):
    """content batches -> (term, docID, tf, positions, dl) rows.

    Shares _normalize_unique with the tokenizer UDF so the two paths
    cannot diverge (tested in tests/test_normalize.py / test_build.py).
    """
    from .functions.tokenize import _normalize_unique

    for pdf in batches:
        if pdf.empty:
            continue
        split = pdf["content"].fillna("").str.split()
        lengths = split.map(len).to_numpy(dtype=np.int64)
        total = int(lengths.sum())
        flat = np.empty(total, dtype=object)
        i = 0
        for toks in split:
            flat[i: i + len(toks)] = toks
            i += len(toks)
        doc_idx = np.repeat(np.arange(len(pdf)), lengths)
        if total:
            uniq = pd.Series(pd.unique(flat))
            mapping = dict(zip(uniq, _normalize_unique(uniq)))
            normed = np.array([mapping[t] for t in flat], dtype=object)
            kept = normed != None  # noqa: E711
        else:
            normed = flat
            kept = np.zeros(0, dtype=bool)
        k_terms = normed[kept]
        k_doc = doc_idx[kept]
        dl_per_doc = np.bincount(k_doc, minlength=len(pdf)).astype(np.int64)
        # position within doc over KEPT terms only (IndexService.java:221-225)
        kept_starts = np.zeros(len(pdf), dtype=np.int64)
        kept_starts[1:] = np.cumsum(dl_per_doc[:-1])
        pos = np.arange(len(k_terms), dtype=np.int64) - np.repeat(kept_starts, dl_per_doc)
        # group by (doc, term): stable lexsort keeps positions ascending
        order = np.lexsort((pos, k_terms.astype("U"), k_doc))
        g_doc, g_term, g_pos = k_doc[order], k_terms[order], pos[order]
        if len(g_doc) == 0:
            continue
        new_group = np.ones(len(g_doc), dtype=bool)
        new_group[1:] = (g_doc[1:] != g_doc[:-1]) | (g_term[1:] != g_term[:-1])
        starts = np.flatnonzero(new_group)
        tf = np.diff(np.append(starts, len(g_doc))).astype(np.int32)
        doc_ids = pdf["docID"].to_numpy(dtype=np.int64)
        yield pd.DataFrame({
            "term": g_term[starts],
            "docID": doc_ids[g_doc[starts]],
            "tf": tf,
            "positions": pd.Series(np.split(g_pos.astype(np.int32), starts[1:]),
                                   dtype=object),
            "dl": dl_per_doc[g_doc[starts]].astype(np.int32),
        })


POSTINGS_SCHEMA = (
    "term string, bucket long, block_id long, n_docs int, "
    "doc_gaps binary, tfs binary, dls binary, pos_gaps binary, "
    "block_max_tf int, block_max_wand double, "
    "block_first_doc long, block_last_doc long, cf long"
)


@dataclass
class IndexConfig:
    docs_per_block: int = 128
    blocks_per_bucket: int = 4096          # bucket spans docs_per_block * blocks_per_bucket docIDs
    k1: float = 1.2
    b: float = 0.75
    tokenizer: str = "pandas"              # "pandas" (north-star Arrow UDF) or "sql" (JVM codegen)
    n_partitions: int | None = None        # defaults to spark.sql.shuffle.partitions
    store_positions: bool = True

    @property
    def docs_per_bucket(self) -> int:
        return self.docs_per_block * self.blocks_per_bucket


@dataclass
class Index:
    store: TableStore
    config: IndexConfig
    stats: dict = field(default_factory=dict)

    @property
    def spark(self) -> SparkSession:
        return self.store.spark

    def table(self, name: str) -> DataFrame:
        return self.store.read(name)

    def load_stats(self) -> dict:
        if not self.stats:
            row = self.store.read("stats").collect()[0]
            self.stats = row.asDict()
        return self.stats


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None, use_iceberg: bool = False):
        self.spark = spark
        self.config = config or IndexConfig()
        self.store = TableStore(spark, index_dir, use_iceberg=use_iceberg)
        self._lineage_rows: list = []

    # ------------------------------------------------------------------
    def build(self, docs: DataFrame, resume: bool = True) -> Index:
        """Build (or resume building) the index over a documents DataFrame
        with columns (repo, path, commit, lang, content)."""
        if not resume:
            self.store.drop_all()
        self._lineage_rows = []

        if not self.store.exists("doc_map"):
            self._build_doc_map(docs)
        if not self.store.exists("partials"):
            self._build_partials(docs)
        if not (self.store.exists("doc_len") and self.store.exists("stats")):
            self._build_doc_len_stats()
        if not self.store.exists("postings"):
            self._build_postings()
        if not self.store.exists("dictionary"):
            self._build_dictionary()
        self._write_lineage()

        idx = Index(store=self.store, config=self.config)
        idx.load_stats()
        return idx

    # ------------------------------------------------------------------
    def _n_partitions(self) -> int:
        return self.config.n_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions"))

    def _record_lineage(self, stage: str, df_name: str, detail: str = "") -> None:
        """Per-partition row counts of a committed stage output, read from
        the parquet file footers — metadata only, no Spark job, no data
        scan (matters at 10^12 rows: lineage bookkeeping must not re-read
        the tables it describes)."""
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self.store.path(df_name), "*.parquet")))
        for i, fp in enumerate(files):
            n = pq.ParquetFile(fp).metadata.num_rows
            self._lineage_rows.append((stage, i, int(n), detail))

    # -- stage 1: docID assignment -------------------------------------
    def _build_doc_map(self, docs: DataFrame) -> None:
        n = self._n_partitions()
        slim = with_sha256(docs).select("repo", "path", "commit", "lang", "sha256")
        slim = slim.repartitionByRange(n, "repo", "path").sortWithinPartitions("repo", "path")

        def number_within_partition(it):
            pid = TaskContext.get().partitionId()
            local = 0
            for pdf in it:
                pdf = pdf.copy()
                pdf["pid"] = np.int32(pid)
                pdf["local_idx"] = np.arange(local, local + len(pdf), dtype=np.int64)
                local += len(pdf)
                yield pdf

        numbered_schema = "repo string, path string, commit string, lang string, sha256 string, pid int, local_idx long"
        numbered = slim.mapInPandas(number_within_partition, schema=numbered_schema)
        # materialize once so offsets and final ids derive from the same
        # pass (persist, not a parquet round-trip: one write saved; at
        # cluster scale use DISK_ONLY or a checkpoint table here)
        numbered = numbered.persist()
        counts = {r["pid"]: r["cnt"] for r in
                  numbered.groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        offsets_df = self.spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, offset long")
        doc_map = (
            numbered.join(F.broadcast(offsets_df), "pid")
            .select((F.col("offset") + F.col("local_idx")).alias("docID"),
                    "repo", "path", "commit", "lang", "sha256")
        )
        self.store.write(doc_map, "doc_map")
        numbered.unpersist()
        self._record_lineage("doc_map", "doc_map")

    # -- stage 2: SPIMI partials ---------------------------------------
    def _build_partials(self, docs: DataFrame) -> None:
        """Map-side SPIMI: tokenize + per-doc inversion fused into ONE
        Arrow kernel with NO shuffle.

        A document lives entirely inside one partition, so the
        (term, docID) aggregation the reference does under a lock
        (IndexService.java:215-233) is partition-local here — the only
        wide exchange in the whole build is the later term-range shuffle
        before block encoding. The kernel is batch-vectorized numpy:
        regex normalization runs once per DISTINCT raw token per batch,
        and the (doc, term) grouping is one stable lexsort.
        """
        doc_ids = self.store.read("doc_map").select("docID", "repo", "path")
        base = docs.select("repo", "path", "content").join(doc_ids, ["repo", "path"])
        if self.config.tokenizer == "sql":
            tokens_col = spark_tokenize_col("content")
            tok = base.select("docID", tokens_col.alias("tokens"))
            tok = tok.withColumn("dl", F.size("tokens"))
            ex = tok.select("docID", "dl", F.posexplode("tokens").alias("pos", "term"))
            partials = (
                ex.groupBy("term", "docID")
                .agg(F.count("*").cast("int").alias("tf"),
                     F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias("positions"),
                     F.first("dl").alias("dl"))
            )
        else:
            partials = base.select("docID", "content").mapInPandas(
                _spimi_invert, schema="term string, docID long, tf int, "
                                      "positions array<int>, dl int")
        self.store.write(partials, "partials")
        self._record_lineage("partials", "partials", detail="postings_emitted")

    # -- stage 3: doc_len + stats --------------------------------------
    def _build_doc_len_stats(self) -> None:
        partials = self.store.read("partials")
        dl = partials.groupBy("docID").agg(F.max("dl").alias("dl"))
        doc_len = (
            self.store.read("doc_map").select("docID")
            .join(dl, "docID", "left")
            .fillna({"dl": 0})
        )
        self.store.write(doc_len, "doc_len")
        agg = self.store.read("doc_len").agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")).collect()[0]
        n_docs, total_len = int(agg["n_docs"]), int(agg["total_len"] or 0)
        avgdl = (total_len / n_docs) if n_docs else 0.0
        stats = self.spark.createDataFrame(
            [(n_docs, total_len, float(avgdl), self.config.k1, self.config.b,
              self.config.docs_per_block, self.config.docs_per_bucket)],
            "n_docs long, total_len long, avgdl double, k1 double, b double, "
            "docs_per_block int, docs_per_bucket long")
        self.store.write(stats, "stats")
        self._record_lineage("doc_len", "doc_len")

    # -- stage 4: block encode -----------------------------------------
    def _build_postings(self) -> None:
        cfg = self.config
        stats = self.store.read("stats").collect()[0]
        avgdl = float(stats["avgdl"]) or 1.0
        k1, b = cfg.k1, cfg.b
        B = cfg.docs_per_block
        blocks_per_bucket = cfg.blocks_per_bucket
        store_positions = cfg.store_positions

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("docID")
            term = pdf["term"].iloc[0]
            bucket = int(pdf["bucket"].iloc[0])
            doc_ids = pdf["docID"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            dls = pdf["dl"].to_numpy(dtype=np.int64)
            if store_positions:
                pos_lists = pdf["positions"].to_numpy()
                flat_pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_lists]) \
                    if len(pos_lists) else np.empty(0, dtype=np.int64)
                starts = np.zeros(len(tfs), dtype=np.int64)
                starts[1:] = np.cumsum(tfs[:-1])
                # gap-code positions per doc: diff then restore absolute firsts
                pos_gaps_all = np.diff(flat_pos, prepend=0)
                pos_gaps_all[starts] = flat_pos[starts]
            tfnorm = tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))

            rows = []
            for i in range(0, len(doc_ids), B):
                j = min(i + B, len(doc_ids))
                d = doc_ids[i:j]
                t = tfs[i:j]
                gaps = np.diff(d, prepend=0)
                gaps[0] = d[0]  # first docID absolute per block (independent decode)
                if store_positions:
                    pg = vb_encode(pos_gaps_all[starts[i]: starts[j - 1] + tfs[j - 1]])
                else:
                    pg = b""
                rows.append((
                    term, bucket,
                    bucket * blocks_per_bucket + i // B,
                    int(j - i),
                    vb_encode(gaps), vb_encode(t), vb_encode(dls[i:j]), pg,
                    int(t.max()), float(tfnorm[i:j].max()),
                    int(d[0]), int(d[-1]), int(t.sum()),
                ))
            return pd.DataFrame(rows, columns=[
                "term", "bucket", "block_id", "n_docs", "doc_gaps", "tfs", "dls",
                "pos_gaps", "block_max_tf", "block_max_wand",
                "block_first_doc", "block_last_doc", "cf"])

        partials = self.store.read("partials")
        cols = ["term", "docID", "tf", "dl"] + (["positions"] if store_positions else [])
        enc = (
            partials.select(*cols)
            .withColumn("bucket", (F.col("docID") / F.lit(cfg.docs_per_bucket)).cast("long"))
            .groupBy("term", "bucket")
            .applyInPandas(encode, schema=POSTINGS_SCHEMA)
        )
        n = self._n_partitions()
        enc = enc.repartitionByRange(n, "term", "bucket").sortWithinPartitions("term", "bucket")
        self.store.write(enc, "postings")
        self._record_lineage("postings", "postings",
                             detail=f"merge_fan_in={partials.rdd.getNumPartitions()}")

    # -- stage 5: dictionary -------------------------------------------
    def _build_dictionary(self) -> None:
        postings = self.store.read("postings")
        dictionary = (
            postings.groupBy("term")
            .agg(F.sum("n_docs").alias("df"),
                 F.sum("cf").alias("cf"),
                 F.count("*").alias("n_blocks"),
                 F.max("block_max_wand").alias("max_block_wand"))
            .withColumn("rterm", F.reverse(F.col("term")))
            .select("term", "rterm", "df", "cf", "n_blocks", "max_block_wand")
        )
        n = self._n_partitions()
        dictionary = dictionary.repartitionByRange(n, "term").sortWithinPartitions("term")
        self.store.write(dictionary, "dictionary")
        self._record_lineage("dictionary", "dictionary")

    # -- stage 6: lineage ----------------------------------------------
    def _write_lineage(self) -> None:
        if not self._lineage_rows:
            return
        df = self.spark.createDataFrame(
            self._lineage_rows, "stage string, partition_id int, rows_out long, detail string")
        mode = "append" if self.store.exists("lineage") else "overwrite"
        self.store.write(df, "lineage", mode=mode)
