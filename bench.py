#!/usr/bin/env python3
"""Benchmark: index build + headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-step MEDIAN sec...}, "runs": {...all runs...},
   "sf": <sf>, ...extras}

Noise protocol (BENCH/BASELINE.md: this host swings ~2x run-to-run and
drifts at session scale): every step — including the index build, with
its output dir cleared per repeat — runs $SPARK_GRAFT_BENCH_REPEATS
times (default 3); the reported per-step number is the MEDIAN and every
run is listed under "runs" so round-over-round comparisons stop chasing
host drift. When benching at fewer cores than the machine has, the
process re-execs itself under `taskset -c 0-(cpus-1)`: Python UDF
workers are separate processes that would otherwise silently borrow the
unpinned cores (same protocol as scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F


def _maybe_pin(cpus: int) -> None:
    if os.environ.get("_IRS_BENCH_PINNED"):
        return
    if shutil.which("taskset") is None:
        return
    total = os.cpu_count() or cpus
    if cpus >= total:
        return  # pinning every core is a no-op
    os.environ["_IRS_BENCH_PINNED"] = "1"
    os.execvp("taskset",
              ["taskset", "-c", f"0-{cpus - 1}", sys.executable] + sys.argv)

from information_retrieval_spark import (bpe, codesearch, dedup, sampling,
                                         similarity, textstats)
from information_retrieval_spark.build import IndexBuilder, IndexConfig
from information_retrieval_spark.corpus import load_testdata_documents
from information_retrieval_spark.query import QueryEngine
from information_retrieval_spark.session import get_spark, warm_python_workers


_DD_STORE = "/tmp/irs_bench_ddstore"


def _dedup_store(spark):
    from information_retrieval_spark.streaming.dedup import IncrementalDeduper
    return IncrementalDeduper(spark, _DD_STORE, num_hashes=16, band_size=4,
                              n=3, id_col="path", text_col="content")


def _dd_split(docs):
    u = F.expr(sampling.uniform_expr("path", "bench-dd"))
    return docs.filter(u < 0.8), docs.filter(u >= 0.8)


def _dedup_inc_build(spark, docs):
    """80% of the corpus -> persisted banded-signature store
    (streaming/dedup.py; store cleared per repeat via reset)."""
    old, _ = _dd_split(docs)
    _dedup_store(spark).append(old, 0)


def _dedup_inc_probe(spark, docs):
    """Steady-state incremental probe: the 20% 'new batch' against the
    persisted store + itself — the per-batch cost an ingestion
    pipeline pays, O(batch + matched buckets), store NOT rebuilt."""
    _, new = _dd_split(docs)
    return _dedup_store(spark).probe(new).count()


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def _host_calibration() -> dict:
    """Fixed single-thread microprobes, measured BEFORE Spark starts.

    This sandbox host shows session-scale external interference (up to
    ~2x wall-clock on identical binaries — BENCH/BASELINE.md protocol
    notes). These two numbers — a pure-CPU sha256 over 256 MB and a
    memory-bandwidth array traversal — let a reader normalize bench
    medians across rounds measured under different host conditions
    instead of misreading interference as an engine regression."""
    import hashlib

    import numpy as np

    blk = b"\x5a" * (8 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(32):  # 256 MB
        h.update(blk)
    cpu = time.perf_counter() - t0
    a = np.arange(1 << 26, dtype=np.int64)  # 512 MB
    s, reps = 0, []
    for _ in range(5):  # median of 5: the interference is bursty
        t0 = time.perf_counter()
        s += int((a + 1).sum())  # ~1 GB read + 0.5 GB write per rep
        reps.append(time.perf_counter() - t0)
    mem = sorted(reps)[2]
    assert s != 0 and h.digest() is not None  # keep the work observable
    return {"sha256_256mb_sec": round(cpu, 3),
            "membw_1gb_sec": round(mem, 3),
            "membw_1gb_all": [round(r, 3) for r in sorted(reps)]}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    _maybe_pin(int(cpus))
    host_calib = _host_calibration()
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark(app_name="irs-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, 2 * int(cpus)))
    spark.range(1000).count()  # JVM warmup
    warm_python_workers(spark, int(cpus))

    docs = load_testdata_documents(spark, sf_dir).cache()
    n_docs = docs.count()

    idx_dir = f"/tmp/irs_bench_idx_{os.path.basename(sf_dir.rstrip('/'))}"

    all_runs: dict[str, list] = {}
    results: dict[str, float] = {}

    def _median(vals: list) -> float:
        import statistics
        return round(statistics.median(vals), 3)  # true median, even or odd N

    state: dict = {}

    def build_once():
        state["idx"] = IndexBuilder(spark, idx_dir, IndexConfig()).build(
            docs, resume=False)

    def record(name, fn, reset=None):
        runs = []
        for _ in range(repeats):
            if reset is not None:
                reset()  # state teardown happens OUTSIDE the timed window
            dt, _out = timed(fn)
            runs.append(round(dt, 3))
        all_runs[name] = runs
        results[name] = _median(runs)

    record("index_build", build_once,
           reset=lambda: shutil.rmtree(idx_dir, ignore_errors=True))
    qe = QueryEngine(state["idx"])
    steps = {
        "bm25_wand": lambda: qe.bm25("spark join window", k=10, wand=True).collect(),
        "bm25_full": lambda: qe.bm25("spark join window", k=10, wand=False).collect(),
        "bm25_snippets": lambda: qe.bm25_snippets(
            "spark join window", k=10).collect(),
        "bm25_proximity": lambda: qe.bm25_proximity(
            "spark join window", k=10, pool=25).collect(),
        "qlm": lambda: qe.qlm("spark join window", k=10).collect(),
        "prf_bm25": lambda: qe.prf_bm25("spark join", k=10).collect(),
        "bm25_boosted": lambda: qe.bm25_boosted(
            {"spark": 2.0, "join": 1.0, "window": 0.5}, k=10).collect(),
        "eval_ndcg": lambda: qe.eval_ndcg(
            {"q_spark": "spark join window", "q_merge": "table merge",
             "q_sort": "sort spark window"}, k=10).collect(),
        "zipf_fit": lambda: qe.zipf_fit().collect(),
        "heaps_fit": lambda: qe.heaps_fit().collect(),
        "collection_stats": lambda: qe.collection_stats().collect(),
        "eval_metrics": lambda: qe.eval_metrics(
            {"q_spark": "spark join window", "q_merge": "table merge",
             "q_sort": "sort spark window"}, k=10).collect(),
        # 8 queries in ONE job (union-term scan + one kernel pass) —
        # compare against ~8x the bm25_full line for the amortization
        "bm25_batch8": lambda: qe.bm25_many(
            {f"q{i}": q for i, q in enumerate([
                "spark join window", "table merge", "sort spark window",
                "merge window", "table spark", "join sort",
                "window table join", "spark merge sort"])}, k=10).collect(),
        "boolean": lambda: qe.boolean_docs(
            "table AND NOT merge OR spark AND window").count(),
        "positional": lambda: qe.positional_docs("spark /3 join").count(),
        "phrase": lambda: qe.phrase_docs("row column sort").count(),
        "joker": lambda: qe.joker_docs("st* *ow").count(),
        "search_corrected": lambda: qe.search_corrected(
            "sparkk joinn window", k=10).collect(),
        "fuzzy_suggest": lambda: qe.suggest("spak", k=5, max_edits=2).collect(),
        "related_terms": lambda: qe.related_terms(
            "spark join", k=10, top_docs=25).collect(),
        # doc-major forward index build (one postings decode pass) ...
        "fwd_index_build": lambda: qe.build_forward_index(),
        # ... then query-by-document rides the file-pruned doc_vec scan
        "more_like_this": lambda: qe.more_like_this(0, k=10,
                                                    n_terms=5).collect(),
        # corpus-wide keyword extraction: one decode pass (or the
        # doc_vec scan when fwd_index_build ran first) + one docID
        # window for the per-doc top-k cut
        "tfidf_keywords": lambda: qe.tfidf_top_terms(k=3).count(),
        # candidate-driven (the gated scale shape): LSH proposes, exact
        # Jaccard verifies over one shared persisted shingle relation —
        # never the corpus-wide shared-shingle self-join
        "dedup_ngram_jaccard_lsh": lambda: dedup.near_duplicates(
            docs, id_col="path", text_col="content", n=3, threshold=0.3,
            num_hashes=16, band_size=2).count(),
        "dedup_near": lambda: dedup.near_duplicates(
            docs, id_col="path", text_col="content", n=3, threshold=0.8,
            num_hashes=64, band_size=8).count(),
        # pairs -> connected components -> canonical clusters (the full
        # curation pipeline; cost on top of dedup_near is the O(log n)
        # star rounds over the tiny pair set)
        "dedup_clusters": lambda: dedup.duplicate_clusters(
            docs, id_col="path", text_col="content", n=3, threshold=0.8,
            num_hashes=64, band_size=8).count(),
        # exact duplicated spans (Lee et al.): gram-fingerprint shuffle
        # + doc-frequency agg + run-merge window over dup positions only
        "dedup_spans": lambda: dedup.duplicated_spans(
            docs, k=8, id_col="path", text_col="content").count(),
        "dedup_span_cut": lambda: dedup.cut_duplicated_spans(
            docs, k=8, id_col="path", text_col="content")
            .agg(F.sum("n_removed_tokens")).collect(),
        "dedup_simhash": lambda: dedup.simhash_signatures(
            docs, id_col="path", text_col="content").count(),
        # block-banded Hamming pairing (pigeonhole-complete candidates)
        "dedup_simhash_pairs": lambda: dedup.simhash_near_duplicates(
            docs, max_hamming=6, id_col="path", text_col="content").count(),
        # incremental ingestion dedup: store build (reset per repeat)
        # measured separately from the steady-state per-batch probe
        "dedup_inc_build": lambda: _dedup_inc_build(spark, docs),
        "dedup_inc_probe": lambda: _dedup_inc_probe(spark, docs),
        "curation_top_quality": lambda: sampling.top_fraction_per_group(
            textstats.quality_scores(docs, id_col="path",
                                     text_col="content")
            .join(docs.select(F.col("path").alias("id"), "lang"), "id"),
            0.3, "lang", "quality", id_col="id").count(),
        "text_quality": lambda: textstats.quality_scores(
            docs, id_col="path", text_col="content").count(),
        # PII detect+redact: two map-only regexp projections (C4-style
        # curation); count() forces the full redaction pass
        "text_pii": lambda: textstats.redact_pii(
            docs, id_col="path", text_col="content")
            .filter(F.length("text_redacted") >= 0).count(),
        # BPE pre-tokenizer piece counts: one regexp_extract_all +
        # array filter, map-only (the LLM token-budget estimate)
        "text_bpe": lambda: textstats.bpe_piece_counts(
            docs, id_col="path", text_col="content")
            .agg(F.sum("n_nonspace_pieces")).collect(),
        # CCNet-style bigram-LM quality filter: reference-split model
        # + per-doc mean transition logprob
        "text_lm_bigram": lambda: textstats.lm_bigram_logprob_scores(
            docs, id_col="path", text_col="content")
            .agg(F.min("mean_logprob")).collect(),
        # corpus bigram top-20: one explode + map-side-combined agg,
        # TakeOrderedAndProject cut (never a full sort shuffle)
        "text_bigrams": lambda: textstats.ngram_counts(
            docs, n=2, k=20, text_col="content").collect(),
        # PMI collocations: two map-side-combined aggs (exchanges
        # reused for the totals) + vocabulary-sized joins
        "text_pmi": lambda: textstats.pmi_bigrams(
            docs, k=20, min_count=3, text_col="content").collect(),
        # end-to-end curation: gate -> span surgery on survivors ->
        # tokens-in/out audit; survivors are checkpointed between the
        # stages (the persisted-gate-output practice — the span stage
        # derives its gram relation twice)
        "pipeline_curate": lambda: dedup.cut_duplicated_spans(
            docs.join(textstats.curation_report(
                docs, lang="en", min_tokens=30, min_quality=0.7,
                max_dup_line=0.2, max_dup_ngram=0.05, id_col="path",
                text_col="content").filter("kept")
                .select(F.col("id").alias("path")), "path")
            .localCheckpoint(eager=True),
            k=8, id_col="path", text_col="content")
            .agg(F.sum("n_kept_tokens")).collect(),
        # data mixing: per-lang token budgets via the exact window path
        "sample_token_mix": lambda: sampling.token_budget_mix(
            docs, {"en": 100_000, "de": 40_000}, strata_col="lang",
            id_col="path", text_col="content")
            .filter("kept").groupBy("stratum")
            .agg(F.sum("n_tokens")).collect(),
        "sample_split": lambda: sampling.train_val_split(
            sampling.hash_sample(docs, 0.5, key_col="path"), 0.25,
            key_col="path").groupBy("split").count().collect(),
        # filtered ranking: exact top-10 OF the lang subcorpus (kernel
        # docID mask below the pushdown cap — zero extra exchanges)
        "bm25_filtered": lambda: qe.bm25_filtered(
            "spark join window", F.col("lang") == "en", k=10).collect(),
        # token-budget sharding: two-phase distributed prefix sum
        "shard_tokens": lambda: sampling.shard_by_token_budget(
            docs, budget_tokens=65536, id_col="path", text_col="content"
        ).groupBy("shard").count().count(),
        # phrase-constrained ranking: exact BM25 top-10 of the docs
        # matching the phrase (bm25_within composition primitive)
        "bm25_phrase": lambda: qe.bm25_phrase(
            "spark join window", "row column sort", k=10).collect(),
        # context-window chunking (training-data prep): one map-only
        # pass, 64-token windows at stride 48
        "text_chunks": lambda: textstats.chunk_documents(
            docs, window=64, stride=48, id_col="path", text_col="content"
        ).agg(F.sum("n_tokens")).collect(),
        # composed curation gate: 4 signals + first-fail reason in ONE
        # fused map-only projection; the groupBy is the by-reason
        # dashboard a curation run watches
        "curation_report": lambda: textstats.curation_report(
            docs, id_col="path", text_col="content")
            .groupBy("reason").count().collect(),
    }
    resets: dict = {}
    # BPE tokenizer training (vocab-sized iterations, corpus scanned
    # once) and the dictionary-driven encode under the learned merges
    bpe_state: dict = {}

    def bpe_train():
        bpe_state["merges"] = [
            (r["left"], r["right"]) for r in
            bpe.train(docs, 8, text_col="content")
            .orderBy("merge_rank").collect()]

    steps["bpe_train8"] = bpe_train
    steps["bpe_encode"] = lambda: bpe.segment_counts(
        docs, bpe_state["merges"], id_col="path", text_col="content"
    ).agg(F.sum("n_bpe_pieces")).collect()
    # trigram code-grep: one-time postings build (reset per repeat),
    # then literal + regex probes against the PERSISTED gram-sorted
    # index — the steady-state query cost, not the build
    grep_dir = f"/tmp/irs_bench_grams_{os.path.basename(sf_dir.rstrip('/'))}"
    grep_state: dict = {}
    resets["code_grep_build"] = lambda: shutil.rmtree(
        grep_dir, ignore_errors=True)

    def code_grep_build():
        grep_state["postings"] = codesearch.trigram_postings(
            docs, id_col="path", text_col="content", postings_path=grep_dir)

    steps["code_grep_build"] = code_grep_build
    steps["code_grep"] = lambda: codesearch.grep_literal(
        docs, "sort table", id_col="path", text_col="content",
        postings=grep_state["postings"]).count()
    steps["code_grep_regex"] = lambda: codesearch.grep_regex(
        docs, "s(ort|can) table", id_col="path", text_col="content",
        postings=grep_state["postings"]).count()
    resets["dedup_inc_build"] = lambda: shutil.rmtree(
        _DD_STORE, ignore_errors=True)
    resets["fwd_index_build"] = lambda: shutil.rmtree(
        f"{idx_dir}/doc_vec", ignore_errors=True)
    emb_path = f"{sf_dir}/embeddings.parquet"
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
        sig_dir = f"/tmp/irs_bench_sigs_{os.path.basename(sf_dir.rstrip('/'))}"
        shutil.rmtree(sig_dir, ignore_errors=True)
        sig_state: dict = {}
        # build steps are idempotent on their _SUCCESS marker: clear the
        # output dirs before each repeat so every run does the real work
        resets["ann_sig_build"] = lambda: (
            shutil.rmtree(f"{sig_dir}/single", ignore_errors=True),
            shutil.rmtree(f"{sig_dir}/banded", ignore_errors=True))
        resets["ann_ivf_build"] = lambda: shutil.rmtree(
            f"{sig_dir}/ivf", ignore_errors=True)

        def ann_sig_build():
            # one-time signature build (single-table + 16-table banded),
            # persisted sorted-by-sig — queries below probe these tables
            sig_state["sigs"] = similarity.persist_signatures(
                emb, f"{sig_dir}/single", nbits=8, seed=42)
            (similarity.build_banded_signatures(emb, n_tables=16, nbits=8,
                                                seed=42)
             .repartitionByRange(4, "table", "sig")
             .sortWithinPartitions("table", "sig")
             .write.mode("overwrite").parquet(f"{sig_dir}/banded"))
            sig_state["banded"] = spark.read.parquet(f"{sig_dir}/banded")

        steps["ann_cosine_topk"] = lambda: similarity.cosine_topk(
            emb, qv, k=10).collect()
        steps["ann_sig_build"] = ann_sig_build
        steps["ann_lsh_topk"] = lambda: similarity.lsh_bucket_topk(
            emb, qv, k=10, nbits=8, signatures=sig_state["sigs"]).collect()
        steps["ann_banded_topk"] = lambda: similarity.banded_lsh_topk(
            emb, qv, k=10, n_tables=16, nbits=8,
            signatures=sig_state["banded"]).collect()

        def ann_ivf_build():
            # sampled quantizer training (train_rate): the coarse
            # centroids come from a deterministic half-corpus sample,
            # assignments still scan every vector once
            sig_state["ivf"] = similarity.persist_ivf(
                emb, f"{sig_dir}/ivf", n_lists=8, iters=2, train_rate=0.5)

        steps["ann_ivf_build"] = ann_ivf_build
        steps["ann_ivf_topk"] = lambda: similarity.ivf_topk(
            emb, qv, k=10, nprobe=2, centroids=sig_state["ivf"][0],
            assignments=sig_state["ivf"][1]).collect()
        steps["ann_semdedup"] = lambda: similarity.semantic_near_duplicates(
            emb, threshold=0.4, centroids=sig_state["ivf"][0],
            assignments=sig_state["ivf"][1]).count()

    for name, fn in steps.items():
        record(name, fn, reset=resets.get(name))

    total = round(sum(results.values()), 3)
    out = {
        "metric": "index_build_plus_query_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "runs": all_runs,
        "repeats": repeats,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec_build": round(n_docs / results["index_build"], 1),
        "cpus": int(cpus),
        "host_calib": host_calib,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
