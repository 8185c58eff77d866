#!/usr/bin/env python3
"""Measure ANN recall@k against exact brute-force cosine ground truth.

The driver gates prove the ANN operators match their oracles EXACTLY
(candidate sets and scores); this harness reports the complementary
quality number — what fraction of the TRUE top-k each approximate
index retrieves — across the three scale paths (single-table LSH,
16-table banded LSH, IVF at several nprobe settings), plus the mean
fraction of the corpus each probe actually scored (the work saved).

Usage:
    python tools/ann_recall.py [sf_dir] [n_queries] [k]

Prints ONE JSON line:
    {"metric": "ann_recall_at_k", "k": ..., "n_queries": ...,
     "recall": {"lsh": r, "banded16": r, "ivf_nprobe1": r, ...},
     "scanned_frac": {...}, "n_vectors": N, "sf_dir": ...}

Not a correctness gate (recall < 1 is the contract of an approximate
index); the exact-oracle gates live in __spark_entry__.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from information_retrieval_spark import similarity  # noqa: E402
from information_retrieval_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="ann-recall",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      shuffle_partitions=32)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vectors = emb.count()

    qrows = (emb.filter(F.col("vec_id") < n_queries)
             .select("vec_id", "embedding").collect())
    queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
               for r in qrows}

    work = tempfile.mkdtemp(prefix="irs_ann_recall_")
    try:
        sigs = similarity.persist_signatures(emb, f"{work}/single",
                                             nbits=8, seed=42)
        (similarity.build_banded_signatures(emb, n_tables=16, nbits=8, seed=42)
         .repartitionByRange(4, "table", "sig")
         .sortWithinPartitions("table", "sig")
         .write.mode("overwrite").parquet(f"{work}/banded"))
        banded = spark.read.parquet(f"{work}/banded")
        centroids, assignments = similarity.persist_ivf(
            emb, f"{work}/ivf", n_lists=8, iters=2, train_rate=0.5)
        list_sizes = {int(r["list_id"]): int(r["n"]) for r in
                      assignments.groupBy("list_id")
                      .agg(F.count(F.lit(1)).alias("n")).collect()}

        methods = {
            "lsh": lambda qv: similarity.lsh_bucket_topk(
                emb, qv, k=k, nbits=8, signatures=sigs),
            "banded16": lambda qv: similarity.banded_lsh_topk(
                emb, qv, k=k, n_tables=16, nbits=8, signatures=banded),
        }
        for nprobe in (1, 2, 4):
            methods[f"ivf_nprobe{nprobe}"] = (
                lambda qv, np_=nprobe: similarity.ivf_topk(
                    emb, qv, k=k, nprobe=np_, centroids=centroids,
                    assignments=assignments))

        hits: dict[str, int] = {m: 0 for m in methods}
        total = 0
        ivf_scanned: dict[int, int] = {1: 0, 2: 0, 4: 0}
        for qid, qv in sorted(queries.items()):
            truth = {int(r["id"]) for r in
                     similarity.cosine_topk(emb, qv, k=k).collect()}
            total += len(truth)
            for m, fn in methods.items():
                got = {int(r["id"]) for r in fn(qv).collect()}
                hits[m] += len(truth & got)
            for nprobe in ivf_scanned:
                probed = similarity.ivf_probe_lists(qv, centroids, nprobe)
                ivf_scanned[nprobe] += sum(list_sizes.get(int(l), 0)
                                           for l in probed)

        recall = {m: round(hits[m] / total, 4) for m in methods}
        scanned = {f"ivf_nprobe{np_}":
                   round(ivf_scanned[np_] / (len(queries) * n_vectors), 4)
                   for np_ in ivf_scanned}
        print(json.dumps({
            "metric": "ann_recall_at_k", "k": k, "n_queries": len(queries),
            "recall": recall, "scanned_frac": scanned,
            "n_vectors": n_vectors, "sf_dir": sf_dir}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
