"""Exactly-once partitioned Parquet sink.

The analog of dstream's Azure Service Bus publisher + topic-per-table routing
(/root/reference/internal/publisher/messaging/azure/servicebus/publisher.go:64-165,
utils.go:14-27), restated for files:

- destination layout ``<root>/<op>/partition=<K>/`` ≙ one topic per source
  table (routing key = conv_id hash bucket instead of table name);
- one file per ``(op, partition, epoch)`` named with the partition watermark,
  written ``.tmp`` then atomically renamed — a replayed epoch regenerates the
  SAME bytes under the SAME name, so retries are idempotent (dstream:
  batch retried, checkpoint not advanced,
  docs/capability-inventory.md:194-199);
- readers trust only files listed in committed manifests (visibility =
  manifest, like checkpoint-after-publish).

Partitioned layout doubles as resumability: a failed run skips finished
``(partition, epoch)`` keys on replay.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from dstream_ray.state.checkpoint import fsync_dir


class ExactlyOnceParquetSink:
    def __init__(self, root: str):
        self.root = root

    def init(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def destroy(self) -> None:
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)

    def file_path(self, op: str, partition: int, epoch: int, watermark_us: int) -> str:
        return os.path.join(
            self.root,
            op,
            f"partition={partition:04d}",
            f"epoch-{epoch:06d}-wm-{watermark_us}.parquet",
        )

    def write_staged(
        self, table: pa.Table, op: str, partition: int, epoch: int, watermark_us: int
    ) -> str:
        """Write the batch to a staging file; returns the FINAL path it will
        occupy after :meth:`promote`. Safe to re-run (overwrites the stage)."""
        final = self.file_path(op, partition, epoch, watermark_us)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        # fsync the staged bytes: the manifest commit is fsynced, so a
        # power loss must not leave a committed manifest referencing a
        # truncated sink file (durability parity with the checkpoint store)
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        return final

    @staticmethod
    def promote(final_paths: list[str]) -> None:
        """Second phase: atomic renames. Idempotent — a missing .tmp with the
        final file present means a previous attempt already promoted it."""
        for final in final_paths:
            tmp = final + ".tmp"
            if os.path.exists(tmp):
                os.replace(tmp, final)
                fsync_dir(os.path.dirname(final))
            elif not os.path.exists(final):
                raise FileNotFoundError(f"neither staged nor final file exists: {final}")

    def read_op(self, op: str, committed_files: list[str] | None = None) -> pa.Table:
        """Read back an operator's committed output (test/verification path,
        ≙ the reference's E2E queue drain test/e2e/e2e_test.go:263-316)."""
        if committed_files is None:
            committed_files = []
            opdir = os.path.join(self.root, op)
            for dirpath, _dirs, files in os.walk(opdir):
                committed_files.extend(
                    os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
                )
        committed_files = sorted(committed_files)
        if not committed_files:
            return None
        return pa.concat_tables([pq.read_table(f) for f in committed_files])
