"""Incremental index maintenance with Structured Streaming.

The reference is batch-only (SURVEY.md §2.4: no streaming); this module
is a Spark-first extension: new documents arrive as files in a
directory (or any streaming source), and each micro-batch is appended
to the live index with `foreachBatch`:

  new docs -> docIDs appended after the current N (arrival order, the
  streaming analogue of the reference's walk-order ids,
  IndexService.java:176) -> Arrow SPIMI kernel -> delta posting blocks
  appended to `postings` -> `dictionary` re-aggregated from block
  metadata (cheap: blocks, not postings) -> `stats` updated.

BM25 correctness under growth: query-time scores are always computed
from current tf/dl/avgdl/df, so they stay EXACT. Only the stored
block-max WAND bounds age: they were computed with the avgdl at encode
time, and tfnorm grows with avgdl. `stats.avgdl_enc_min` tracks the
smallest avgdl any live block was encoded under; the query engine
inflates stored bounds by max(1, avgdl_now / avgdl_enc_min), which is a
sound upper bound (for avgdl_now >= enc: tfnorm_now <= tfnorm_enc *
avgdl_now/enc), so pruning remains exact-safe.

Checkpointing/exactly-once is delegated to Structured Streaming's
`checkpointLocation`; the per-batch appends are idempotent per batch_id
only to the extent parquet appends are — a production deployment would
write through Iceberg transactions (io.TableStore.use_iceberg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build import (
    PARTIALS_SCHEMA,
    POSTINGS_SCHEMA,
    Index,
    IndexConfig,
    _make_block_encoder,
    _spimi_invert_arrow,
)
from ..corpus import DOCUMENTS_SCHEMA, with_sha256
from ..io import TableStore


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.config = config or IndexConfig()
        self.store = TableStore(spark, index_dir)

    # -- one micro-batch -------------------------------------------------
    def append_batch(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        stats = self.store.read("stats").collect()[0].asDict()
        n_before = int(stats["n_docs"])
        avgdl_now = float(stats["avgdl"]) or 1.0

        batch = with_sha256(batch_df).orderBy("repo", "path").coalesce(1)
        from pyspark.sql import Window
        w = Window.orderBy("repo", "path")  # micro-batches are small
        doc_map_delta = batch.select(
            (F.row_number().over(w).cast("long") - 1 + F.lit(n_before)).alias("docID"),
            "repo", "path", "commit", "lang", "sha256")
        self.store.write(doc_map_delta, "doc_map", mode="append")

        docs_with_id = batch.join(doc_map_delta.select("docID", "repo", "path"),
                                  ["repo", "path"])
        partials = docs_with_id.select("docID", "content").mapInArrow(
            _spimi_invert_arrow, schema=PARTIALS_SCHEMA)
        n = 4
        cfg = self.config
        encode = _make_block_encoder(cfg, avgdl_now)
        enc = (partials
               .withColumn("bucket", (F.col("docID") / F.lit(cfg.docs_per_bucket)).cast("long"))
               .repartition(n, "term", "bucket")
               .sortWithinPartitions("term", "bucket", "docID")
               .mapInArrow(encode, schema=POSTINGS_SCHEMA))
        self.store.write(enc, "postings", mode="append")

        # doc_len semantics match the batch build: rows only for docs with
        # >=1 kept term (absent row == dl 0)
        dl_delta = partials.groupBy("docID").agg(F.max("dl").alias("dl"))
        self.store.write(dl_delta, "doc_len", mode="append")

        # dictionary: re-aggregate from block METADATA (never the postings)
        postings = self.store.read("postings")
        dictionary = (
            postings.groupBy("term")
            .agg(F.sum("n_docs").alias("df"), F.sum("cf").alias("cf"),
                 F.count("*").alias("n_blocks"),
                 F.max("block_max_wand").alias("max_block_wand"))
            .withColumn("rterm", F.reverse(F.col("term")))
            .select("term", "rterm", "df", "cf", "n_blocks", "max_block_wand"))
        self.store.write(dictionary, "tmp_dictionary_new")
        self.store.drop("dictionary")
        import os
        os.rename(self.store.path("tmp_dictionary_new"), self.store.path("dictionary"))

        n_new = n_before + doc_map_delta.count()
        batch_len = int(dl_delta.agg(F.sum("dl")).collect()[0][0] or 0)
        total_len = int(stats["total_len"]) + batch_len
        new_stats = self.spark.createDataFrame(
            [(n_new, total_len, float(total_len / n_new) if n_new else 0.0,
              cfg.k1, cfg.b, cfg.docs_per_block, cfg.docs_per_bucket,
              min(float(stats.get("avgdl_enc_min") or avgdl_now), avgdl_now))],
            "n_docs long, total_len long, avgdl double, k1 double, b double, "
            "docs_per_block int, docs_per_bucket long, avgdl_enc_min double")
        self.store.write(new_stats, "tmp_stats_new")
        self.store.drop("stats")
        os.rename(self.store.path("tmp_stats_new"), self.store.path("stats"))

    # -- streaming driver --------------------------------------------------
    def stream_from_directory(self, input_dir: str, checkpoint_dir: str,
                              available_now: bool = True):
        """File-source stream: every new parquet file of documents in
        `input_dir` is appended to the index, one micro-batch at a time."""
        stream = (self.spark.readStream
                  .schema(DOCUMENTS_SCHEMA)
                  .parquet(input_dir))
        writer = (stream.writeStream
                  .foreachBatch(lambda df, bid: self.append_batch(df, bid))
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def index(self) -> Index:
        idx = Index(store=self.store, config=self.config)
        idx.load_stats()
        return idx
