"""Incremental index maintenance with Structured Streaming.

The reference is batch-only (SURVEY.md §2.4: no streaming); this module
is a Spark-first extension: new documents arrive as files in a
directory (or any streaming source), and each micro-batch is appended
to the live index with `foreachBatch`:

  new docs -> docIDs appended after the current N (arrival order, the
  streaming analogue of the reference's walk-order ids,
  IndexService.java:176; ranked with the SAME two-phase
  range-partition + prefix-sum trick as the batch build — no
  coalesce(1), no single-task window) -> Arrow SPIMI kernel -> delta
  posting blocks appended to `postings` -> `dictionary` /
  `dictionary_r` / `bucket_max` get per-batch SEGMENT files appended
  (LSM-style): a micro-batch writes O(delta) bytes TOTAL — the batch's
  own vocabulary, never a rewrite of the full merged dictionary.
  Readers fold segments (build.Index.table groups duplicate term rows);
  `compact()` is the explicit maintenance operation that folds the
  segments into a fresh base and re-ranks the dense `term_ord`
  ordinals (Q16). Until a compaction, term_ord is valid AS OF the last
  compaction; QueryEngine.term_dict_pos detects the segmented state
  and computes the exact current ordinal with a rank query instead.

Idempotency & crash recovery (plain-parquet mode; an Iceberg deployment
replaces all of this with one transactional commit):

  - `applied/<batch_id>.done` markers make a replayed batch a NO-OP.
  - Each batch stages its deltas under `tmp_batch_<id>/` with a
    `meta.json` holding the PRE-batch stats (docID base, totals) — a
    retry after a partial failure recomputes from the same inputs,
    byte-identically, regardless of what the failed attempt already
    linked.
  - EVERY live-table mutation a batch makes is an APPEND of files with
    DETERMINISTIC names (`batch<id>_<i>.parquet`); a retry first
    removes that batch's files and re-links, so partial appends never
    double-count. (Round-2 rewrote dictionary/bucket_max per batch and
    needed hardlink snapshots to make retries deterministic; segments
    made that machinery unnecessary.)
  - The marker is written last. Tested: the same batch applied twice
    (and a replay after a simulated partial failure) yields an
    identical index (tests/test_streaming.py).

BM25 correctness under growth: query-time scores are always computed
from current tf/dl/avgdl/df, so they stay EXACT. Only the stored
block-max WAND bounds age: they were computed with the avgdl at encode
time, and tfnorm grows with avgdl. `stats.avgdl_enc_min` tracks the
smallest avgdl any live block was encoded under; the query engine
inflates stored bounds by max(1, avgdl_now / avgdl_enc_min), which is a
sound upper bound, so pruning remains exact-safe.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build import (
    PARTIALS_SCHEMA,
    POSTINGS_SCHEMA,
    Index,
    IndexConfig,
    _fold_bucket_max,
    _fold_dictionary,
    _make_block_encoder,
    _spimi_invert_arrow,
    with_global_ordinals,
)
from ..corpus import DOCUMENTS_SCHEMA, with_sha256
from ..io import TableStore


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, index_dir: str,
                 config: IndexConfig | None = None):
        self.spark = spark
        self.config = config or IndexConfig()
        self.store = TableStore(spark, index_dir)

    # -- batch bookkeeping -------------------------------------------------
    def _marker(self, batch_id: int) -> str:
        d = self.store.path("applied")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{batch_id}.done")

    def _stage_dir(self, batch_id: int, *parts: str) -> str:
        return os.path.join(self.store.path(f"tmp_batch_{batch_id}"), *parts)

    def _append_files(self, staged: str, table: str, batch_id: int) -> None:
        """Move staged parquet files into the live table under
        deterministic names; removes this batch's files first so a retry
        never double-appends."""
        live = self.store.path(table)
        for old in glob.glob(os.path.join(live, f"batch{batch_id}_*.parquet")):
            os.remove(old)
        files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
        for i, fp in enumerate(files):
            tgt = os.path.join(live, f"batch{batch_id}_{i:05d}.parquet")
            os.link(fp, tgt)

    # -- one micro-batch -------------------------------------------------
    def append_batch(self, batch_df: DataFrame, batch_id: int = 0,
                     _fail_after: str | None = None) -> None:
        """Apply one micro-batch. `_fail_after` is a TEST-ONLY crash
        injection point ('links' | 'merges' | 'stats') used to prove
        retry convergence after partial failures."""
        if os.path.exists(self._marker(batch_id)):
            return  # replayed batch (foreachBatch retry): NO-OP

        def crash_point(name):
            if _fail_after == name:
                raise RuntimeError(f"injected crash after {name}")

        # -- stage 0: pin pre-batch state (idempotent across retries) ----
        meta_path = self._stage_dir(batch_id, "meta.json")
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))
        else:
            os.makedirs(self._stage_dir(batch_id), exist_ok=True)
            stats = self.store.read("stats").collect()[0].asDict()
            meta = {"n_before": int(stats["n_docs"]),
                    "total_len_before": int(stats["total_len"]),
                    "avgdl_now": float(stats["avgdl"]) or 1.0,
                    "avgdl_enc_min": float(stats.get("avgdl_enc_min")
                                           or (float(stats["avgdl"]) or 1.0))}
            tmp = meta_path + ".tmp"
            json.dump(meta, open(tmp, "w"))
            os.rename(tmp, meta_path)
        n_before = meta["n_before"]

        # -- stage 1: deterministic deltas (overwrite -> retry-safe) -----
        # docID assignment: the same two-phase global rank as the batch
        # build (range-partition the slim key projection, number rows
        # per partition once, prefix-sum the counts) — distributed, no
        # coalesce(1)/Window single-task stage, and deterministic
        # because (repo, path) keys are unique
        batch = with_sha256(batch_df)
        order_tbl = f"tmp_batch_{batch_id}_dm_order"
        ranked = with_global_ordinals(
            self.spark, self.store, batch.select("repo", "path"),
            ["repo", "path"], "ord", order_tbl, 4)
        doc_map_delta = (
            ranked.join(batch, ["repo", "path"])
            .select((F.col("ord") + F.lit(n_before)).cast("long").alias("docID"),
                    "repo", "path", "commit", "lang", "sha256"))
        doc_map_delta.write.mode("overwrite").parquet(
            self._stage_dir(batch_id, "doc_map"))
        self.store.drop(order_tbl)
        doc_map_delta = self.spark.read.parquet(self._stage_dir(batch_id, "doc_map"))

        docs_with_id = batch.join(doc_map_delta.select("docID", "repo", "path"),
                                  ["repo", "path"])
        partials = docs_with_id.select("docID", "content").mapInArrow(
            _spimi_invert_arrow, schema=PARTIALS_SCHEMA)
        cfg = self.config
        encode = _make_block_encoder(cfg, meta["avgdl_now"])
        enc = (partials
               .withColumn("bucket", (F.col("docID") / F.lit(cfg.docs_per_bucket)).cast("long"))
               .repartition(4, "term", "bucket")
               .sortWithinPartitions("term", "bucket", "docID")
               .mapInArrow(encode, schema=POSTINGS_SCHEMA))
        enc.write.mode("overwrite").parquet(self._stage_dir(batch_id, "postings"))
        post_delta = self.spark.read.parquet(self._stage_dir(batch_id, "postings"))

        # doc_len semantics match the batch build: rows only for docs with
        # >=1 kept term (absent row == dl 0)
        dl_delta = partials.groupBy("docID").agg(F.max("dl").alias("dl"))
        dl_delta.write.mode("overwrite").parquet(self._stage_dir(batch_id, "doc_len"))

        # metadata SEGMENTS: aggregates over the batch's blocks ONLY —
        # O(batch vocabulary) rows, independent of the live vocabulary.
        # Readers fold duplicate term rows (build._fold_dictionary etc).
        bmax_delta = (post_delta.groupBy("term", "bucket")
                      .agg(F.max("block_max_wand").alias("tmax"),
                           F.count("*").alias("n_blocks")))
        bmax_delta.write.mode("overwrite").parquet(
            self._stage_dir(batch_id, "bucket_max"))
        dict_delta = (post_delta.groupBy("term")
                      .agg(F.sum("n_docs").cast("long").alias("df"),
                           F.sum("cf").cast("long").alias("cf"),
                           F.count("*").alias("n_blocks"),
                           # upper-bound semantics (a delta bucket may
                           # also exist in the base): only used by the
                           # WAND driver-slice size gate, where an
                           # overestimate is safe
                           F.countDistinct("bucket").alias("n_buckets"),
                           F.max("block_max_wand").alias("max_block_wand"))
                      .select("term", F.reverse("term").alias("rterm"),
                              "df", "cf", "n_blocks", "n_buckets",
                              "max_block_wand",
                              # ordinals are re-ranked at compaction
                              F.lit(None).cast("long").alias("term_ord")))
        dict_delta.write.mode("overwrite").parquet(
            self._stage_dir(batch_id, "dictionary"))
        dict_r_delta = dict_delta.select("rterm", "term", "df")
        dict_r_delta.write.mode("overwrite").parquet(
            self._stage_dir(batch_id, "dictionary_r"))

        # -- stage 2: link ALL deltas into the live tables (append-only,
        # deterministic names -> retries converge) ------------------------
        for table in ("doc_map", "postings", "doc_len"):
            self._append_files(self._stage_dir(batch_id, table), table, batch_id)
        crash_point("links")
        for table in ("dictionary", "dictionary_r", "bucket_max"):
            self._append_files(self._stage_dir(batch_id, table), table, batch_id)
        crash_point("merges")

        # -- stage 3: stats (from meta + the staged delta, deterministic)
        n_delta = doc_map_delta.count()
        batch_len = int(self.spark.read.parquet(self._stage_dir(batch_id, "doc_len"))
                        .agg(F.sum("dl")).collect()[0][0] or 0)
        n_new = n_before + n_delta
        total_len = meta["total_len_before"] + batch_len
        new_stats = self.spark.createDataFrame(
            [(n_new, total_len, float(total_len / n_new) if n_new else 0.0,
              cfg.k1, cfg.b, cfg.docs_per_block, cfg.docs_per_bucket,
              min(meta["avgdl_enc_min"], meta["avgdl_now"]))],
            "n_docs long, total_len long, avgdl double, k1 double, b double, "
            "docs_per_block int, docs_per_bucket long, avgdl_enc_min double")
        self.store.write(new_stats, "tmp_stats_new")
        self._swap("stats", "tmp_stats_new")
        crash_point("stats")

        # -- stage 4: commit marker + cleanup -----------------------------
        tmp = self._marker(batch_id) + ".tmp"
        open(tmp, "w").write("done")
        os.rename(tmp, self._marker(batch_id))
        shutil.rmtree(self._stage_dir(batch_id), ignore_errors=True)

    # -- compaction --------------------------------------------------------
    def compact(self) -> None:
        """Fold pending segments into fresh base tables and re-rank the
        dense term_ord ordinals (Q16 surface) — the LSM maintenance
        operation. Cost is O(vocabulary), paid once per compaction
        instead of once per micro-batch. Each table swap is a versioned
        manifest-pointer flip (TableStore.publish): crash-safe (the
        pointer rename is the single atomic commit) and safe for
        concurrent readers (the previous version stays on disk until
        the next compaction; an Iceberg deployment gets the same
        semantics as a snapshot commit)."""
        if not self.store.has_segments("dictionary") and \
                not self.store.has_segments("bucket_max"):
            return
        merged = _fold_dictionary(self.store.read("dictionary")).drop("term_ord")
        merged = with_global_ordinals(
            self.spark, self.store, merged, ["term"], "term_ord",
            "tmp_compact_order", 4)
        self.store.write(merged, "tmp_dictionary_new")
        self.store.drop("tmp_compact_order")
        self._swap("dictionary", "tmp_dictionary_new")
        d_r = (self.store.read("dictionary").select("rterm", "term", "df")
               .repartitionByRange(4, "rterm").sortWithinPartitions("rterm"))
        self.store.write(d_r, "tmp_dictionary_r_new")
        self._swap("dictionary_r", "tmp_dictionary_r_new")
        bmax = (_fold_bucket_max(self.store.read("bucket_max"))
                .repartitionByRange(4, "term", "bucket")
                .sortWithinPartitions("term", "bucket"))
        self.store.write(bmax, "tmp_bucket_max_new")
        self._swap("bucket_max", "tmp_bucket_max_new")

    def _swap(self, live: str, staged: str) -> None:
        """Versioned atomic swap (TableStore.publish): the manifest
        pointer flip is the single commit point, so a crash anywhere in
        the swap never loses the live table (ADVICE r3: the old
        drop+rename lost dictionary/dictionary_r/bucket_max on a crash
        between the two calls, and compaction has no replay marker to
        rebuild from), and a concurrent reader that resolved the old
        version keeps a readable table until the NEXT compaction."""
        self.store.publish(live, staged)

    # -- streaming driver --------------------------------------------------
    def stream_from_directory(self, input_dir: str, checkpoint_dir: str,
                              available_now: bool = True,
                              compact_every: int | None = None):
        """File-source stream: every new parquet file of documents in
        `input_dir` is appended to the index, one micro-batch at a time.
        `compact_every`: fold segments every N batches (after the batch
        COMMITS, so a compaction crash never affects batch replay)."""
        stream = (self.spark.readStream
                  .schema(DOCUMENTS_SCHEMA)
                  .parquet(input_dir))

        def apply(df, bid):
            self.append_batch(df, bid)
            if compact_every and (bid + 1) % compact_every == 0:
                self.compact()

        writer = (stream.writeStream
                  .foreachBatch(apply)
                  .option("checkpointLocation", checkpoint_dir))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def index(self) -> Index:
        idx = Index(store=self.store, config=self.config)
        idx.load_stats()
        return idx
