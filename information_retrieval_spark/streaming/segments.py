"""Shared LSM micro-batch segment mechanics.

Both incremental consumers — the index maintainer
(streaming/incremental.py) and the ingestion deduper
(streaming/dedup.py) — persist per-batch state the same way: a batch
stages its parquet output under a private tmp dir, hardlinks the files
into the live table under DETERMINISTIC names (``batch{id}_{i}``,
removing its own stale files first so a retry never double-appends),
and writes a commit marker LAST, so a crashed/replayed foreachBatch
converges and a replay of a committed batch is a no-op. Compactions
must refuse to fold a batch that linked files but never committed:
once its partial rows are baked into a base, the retry's
remove-and-relink can no longer supersede them and the batch would be
counted twice.

This mixin is that contract, written once. Requirements on the host
class: ``self.spark`` (SparkSession), ``self.store`` (io.TableStore)
and ``SEGMENTED_TABLES`` (the tables whose live dirs receive
``batch*_*.parquet`` links).
"""

from __future__ import annotations

import glob
import os
import shutil


class BatchSegments:
    """Mixin: idempotent per-batch segment append + commit bookkeeping."""

    # tables that accumulate per-batch segment files (override)
    SEGMENTED_TABLES: tuple = ()

    # -- batch bookkeeping -------------------------------------------------
    def _marker(self, batch_id: int) -> str:
        d = self.store.path("applied")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{batch_id}.done")

    def _stage_dir(self, batch_id: int, *parts: str) -> str:
        return os.path.join(self.store.path(f"tmp_batch_{batch_id}"), *parts)

    def _append_files(self, staged: str, table: str, batch_id: int) -> None:
        """Link staged parquet files into the live table under
        deterministic names; removes this batch's files first so a retry
        never double-appends."""
        live = self.store.path(table)
        os.makedirs(live, exist_ok=True)
        for old in glob.glob(os.path.join(live, f"batch{batch_id}_*.parquet")):
            os.remove(old)
        files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
        for i, fp in enumerate(files):
            tgt = os.path.join(live, f"batch{batch_id}_{i:05d}.parquet")
            os.link(fp, tgt)

    def _stage_and_link(self, df, table: str, batch_id: int) -> None:
        """Write + link in one step (consumers without intermediate
        crash-injection points between the two)."""
        staged = self._stage_dir(batch_id, table)
        df.write.mode("overwrite").parquet(staged)
        self._append_files(staged, table, batch_id)

    def _commit_batch(self, batch_id: int) -> None:
        """Commit marker LAST (atomic rename), then drop the stage dir —
        every earlier crash state is retryable, every later replay a
        no-op."""
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as fh:
            fh.write("done")
        os.rename(tmp, self._marker(batch_id))
        shutil.rmtree(self._stage_dir(batch_id), ignore_errors=True)

    # -- compaction guard ----------------------------------------------------
    def _uncommitted_batch_ids(self) -> set:
        """Batch ids with linked segment files but NO commit marker —
        a batch that crashed mid-apply and is pending a foreachBatch
        retry. Compaction MUST NOT fold these (double-count on retry,
        see module docstring)."""
        ids = set()
        for t in self.SEGMENTED_TABLES:
            for fp in glob.glob(os.path.join(self.store.path(t),
                                             "batch*_*.parquet")):
                ids.add(int(os.path.basename(fp).split("_")[0][5:]))
        return {i for i in ids if not os.path.exists(self._marker(i))}

    def _require_all_committed(self) -> None:
        pending = self._uncommitted_batch_ids()
        if pending:
            raise RuntimeError(
                f"compact() refused: batches {sorted(pending)} have "
                "linked segment files but no commit marker (crashed "
                "mid-apply). Re-apply them (batch replays are "
                "idempotent) before compacting — folding partial files "
                "into a base would double-count the retry.")
