"""Table storage layer.

The engine's persistent state is a set of relational tables (SURVEY.md
§1.1: the index IS the persisted tables — no separate cache layer like
the reference's Java-serialized index.bin, CacheManager.java:33-47):

    doc_map(docID, repo, path, commit, lang)
    doc_len(docID, dl)
    doc_sha(docID, sha256)   -- per-row content fingerprint (input_hint)
    stats(n_docs, total_len, avgdl)
    dictionary(term, rterm, df, cf, n_blocks, max_block_score)
    postings(term, bucket, block_id, n_docs, doc_gaps, tfs, dls,
             pos_gaps, block_max_tf, block_max_score, block_first_doc,
             block_last_doc, cf)
    lineage(stage, partition_id, rows_out, detail)

On a cluster these are Iceberg tables (`spark.read.format("iceberg")`);
the sandbox has no Iceberg runtime jar, so TableStore writes plain
parquet directories with a `_SUCCESS` marker — the layout and the
engine code above this layer are identical either way. Completed-stage
detection via `_SUCCESS` is what makes the build resumable: a re-run
skips every stage whose output committed (north_rule resumability).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    """Relational-table persistence with two backends:

    - parquet directories (sandbox default): `_SUCCESS` markers gate
      stage completion for resumability.
    - Iceberg (``use_iceberg=True``): tables live under
      ``<catalog>.<namespace>.<name>``; commits are transactional, so
      `_SUCCESS`-style markers are replaced by catalog existence. Needs
      iceberg-spark-runtime on the classpath plus a catalog config, e.g.

          spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog
          spark.sql.catalog.local.type = hadoop
          spark.sql.catalog.local.warehouse = /path/to/warehouse

      The sandbox ships no Iceberg jar; the writer/reader call contract
      is pinned by tests/test_io_iceberg.py against mocks so the branch
      cannot rot silently.
    """

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool = False,
                 catalog: str = "local", namespace: str = "irs"):
        self.spark = spark
        self.root = root
        self.use_iceberg = use_iceberg  # flip when iceberg-spark-runtime is on the classpath
        self.catalog = catalog
        self.namespace = namespace
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        """Resolved directory of a table. Tables that have been through
        `publish()` resolve via their manifest pointer to the current
        `<name>@v<N>` version directory; everything else is the plain
        `<root>/<name>` directory."""
        m = self._manifest_file(name)
        if os.path.exists(m):
            with open(m) as f:
                return os.path.join(self.root, json.load(f)["current"])
        return os.path.join(self.root, name)

    def _manifest_file(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    def publish(self, name: str, staged: str) -> None:
        """Atomically swap table `name` to the contents of staged table
        `staged` — the crash-safe, concurrent-reader-safe replacement
        for drop+rename (which loses the table if the process dies
        between the two calls, and yanks files out from under a reader
        mid-scan):

        1. the staged dir is renamed to `<name>@v<N+1>` (a leftover
           orphan at that path from a previously crashed publish is
           removed first),
        2. the manifest pointer is written via tmp + os.replace — the
           ONE atomic commit point; a crash before it leaves the old
           version live, after it the new one,
        3. the previous-previous version is deleted. The immediately
           previous version is RETAINED until the next publish, so a
           reader that resolved its file list just before the swap
           keeps a readable table (bounded-grace concurrency, the
           plain-parquet stand-in for an Iceberg snapshot commit).
        """
        if self.use_iceberg:
            # ONE transactional commit (Iceberg CREATE OR REPLACE swaps
            # the table pointer atomically; readers on the old snapshot
            # keep reading it) — never DROP-then-RENAME, which loses the
            # table if the process dies between the two statements
            self.spark.sql(
                f"CREATE OR REPLACE TABLE {self.ident(name)} "
                f"AS SELECT * FROM {self.ident(staged)}")
            self.spark.sql(f"DROP TABLE IF EXISTS {self.ident(staged)}")
            return
        m = self._manifest_file(name)
        version, prev = 0, None
        if os.path.exists(m):
            with open(m) as f:
                info = json.load(f)
            version, prev = info["version"], info["current"]
        elif os.path.exists(os.path.join(self.root, name)):
            prev = name  # pre-versioning plain dir becomes the grace copy
        new_dir = f"{name}@v{version + 1}"
        tgt = os.path.join(self.root, new_dir)
        if os.path.exists(tgt):  # orphan of a publish that crashed pre-commit
            shutil.rmtree(tgt)
        os.rename(os.path.join(self.root, staged), tgt)
        tmp = m + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version + 1, "current": new_dir,
                       "previous": prev}, f)
        os.replace(tmp, m)  # atomic commit point
        # sweep EVERY version except current + immediately-previous (not
        # just the old manifest's 'previous': a crash between a past
        # commit and its sweep would otherwise leak that version forever)
        import glob
        keep = {new_dir, prev}
        for p in glob.glob(os.path.join(self.root, f"{name}@v*")):
            if os.path.basename(p) not in keep:
                shutil.rmtree(p, ignore_errors=True)
        if version >= 1:
            # the pre-versioning plain dir was the grace copy for v1's
            # readers only; from v2 on it is two generations stale
            shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(self.ident(name))
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list | None = None, sort_by: list | None = None,
              options: dict | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        for key, val in (options or {}).items():
            w = w.option(key, val)
        if self.use_iceberg:
            w.format("iceberg").saveAsTable(self.ident(name))
        else:
            w.parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").table(self.ident(name))
        return self.spark.read.parquet(self.path(name))

    def has_segments(self, name: str) -> bool:
        """True if the table dir holds streaming LSM segment files
        (`batch<N>_*.parquet`, appended by IncrementalIndexer) pending
        compaction. An Iceberg deployment has no segment state: merges
        are transactional MERGE INTO commits."""
        if self.use_iceberg:
            return False
        import glob
        return bool(glob.glob(os.path.join(self.path(name), "batch*_*.parquet")))

    def drop(self, name: str) -> None:
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.ident(name)}")
            return
        import glob
        for p in ([self.path(name), os.path.join(self.root, name)]
                  + glob.glob(os.path.join(self.root, f"{name}@v*"))):
            if os.path.exists(p):
                shutil.rmtree(p)
        m = self._manifest_file(name)
        if os.path.exists(m):
            os.remove(m)

    def drop_all(self) -> None:
        if self.use_iceberg:
            for name in ("doc_map", "partials", "doc_len", "stats", "postings",
                         "bucket_max", "dictionary", "dictionary_r", "lineage"):
                self.drop(name)
            return
        if os.path.exists(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)
