"""The streaming epoch runner — capture → window/join → exactly-once sink.

Maps dstream's full pipeline lifecycle (run/init/plan/status/destroy,
/root/reference/pkg/executor/providers.go:30-108 and cmd/*.go) onto a
micro-batched Ray Data job:

driver epoch loop (≙ the CDC poll loop, docs/plugins/mssql-ingester.md:23-73):
  1. discover feed parquet shards beyond the committed file cursor
  2. ``read_parquet`` → ``map_batches`` partitioner (FNV-1a on conv_id) —
     zero-copy Arrow, stateless tasks
  3. ONE hash shuffle: ``groupby("partition_id").map_groups`` runs
     :func:`process_partition` per partition — relay dedup + every enabled
     window/join kernel, with carried state loaded from the checkpoint store
  4. tasks stage sink files (.tmp); the driver promotes (atomic renames) and
     THEN commits the epoch manifest — publish-then-advance-checkpoint,
     crash anywhere ⇒ replay is idempotent
  5. at end of feed, a flush epoch closes all open windows (raw
     ``@ray.remote`` tasks per partition — Ray Data can't express a
     zero-input keyed stage)

Scale notes: the number of partitions P is the unit of parallelism AND state
ownership (pick P ≈ 2-4× cluster cores; each partition's epoch slice must fit
a worker's heap). State/checkpoint/sink directories must be on storage every
node can reach. The only all-to-all exchange per epoch is the single
``groupby``; everything else is map-only.
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from dstream_ray.common import partition_ids
from dstream_ray.sinks.parquet_sink import ExactlyOnceParquetSink
from dstream_ray.stages.capture import relay_kernel
from dstream_ray.stages.windows import (
    session_join_kernel,
    session_kernel,
    sliding_kernel,
    to_residual_rows,
    tumbling_kernel,
)
from dstream_ray.state.checkpoint import CheckpointStore

# operator registry: name -> (kernel, default params); the user-extension
# surface (≙ provider protocol, readme.md:297-306) is "add a kernel fn with
# the (new_rows, state, *, flush, **params) contract and register it".
WINDOW_OPERATORS = {
    "tumbling": tumbling_kernel,
    "sliding": sliding_kernel,
    "session": session_kernel,
    "session_join": session_join_kernel,
}


@dataclass
class StreamingConfig:
    feed_dir: str
    out_dir: str
    num_partitions: int = 8
    files_per_epoch: int = 2
    # operator name -> params; "events" (the relay/capture sink) is always on
    operators: dict[str, dict[str, Any]] = field(
        default_factory=lambda: {
            "tumbling": {"width_s": 3600},
            "session": {"gap_s": 1800},
            "session_join": {"gap_s": 1800},
        }
    )
    allowed_lateness_s: int | None = None  # None = late routing off

    @property
    def sink_dir(self) -> str:
        return os.path.join(self.out_dir, "sink")

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.out_dir, "checkpoints")


def process_partition(
    table: pa.Table | None,
    partition: int,
    epoch: int,
    prev: dict[str, Any],
    cfg: StreamingConfig,
    *,
    flush: bool,
) -> dict[str, Any]:
    """Run one partition's epoch: relay + all window kernels + staged sink
    writes + state snapshot. Pure w.r.t. (input rows, prev state) — replaying
    it produces identical emissions, which is what makes the two-phase commit
    exactly-once observable."""
    store = CheckpointStore(cfg.checkpoint_dir)
    sink = ExactlyOnceParquetSink(cfg.sink_dir)
    state = store.load_state(prev.get("state_path"))
    prev_wm = int(prev.get("watermark_us", -1))
    rows_in = table.num_rows if table is not None else 0
    if table is None:
        table = _empty_feed_table()

    files: list[str] = []
    rows_out: dict[str, int] = {}

    # late-data policy (north-star W7): a row is late if its ts is behind the
    # partition watermark by more than the allowance — route to 'late' sink,
    # exclude from windows. (The reference never produces late data: LSN
    # order is total per table; here cross-conv ts skew can.)
    late_table = None
    if cfg.allowed_lateness_s is not None and table.num_rows:
        ts_us = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        late_mask = ts_us < (prev_wm - cfg.allowed_lateness_s * 1_000_000)
        if late_mask.any():
            late_table = table.filter(pa.array(late_mask))
            table = table.filter(pa.array(~late_mask))

    # 1. relay/capture: dedup vs positional cursor, stable order, byte-equal text
    relay_out, relay_state = relay_kernel(table, state.get("relay", {}), flush=flush)
    state["relay"] = relay_state
    wm = prev_wm
    if relay_out.num_rows:
        wm = max(
            prev_wm,
            int(
                np.max(
                    relay_out["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                )
            ),
        )

    if relay_out.num_rows:
        files.append(
            sink.write_staged(
                relay_out.drop_columns(["partition_id"])
                if "partition_id" in relay_out.column_names
                else relay_out,
                "events",
                partition,
                epoch,
                wm,
            )
        )
    rows_out["events"] = relay_out.num_rows
    if late_table is not None and late_table.num_rows:
        files.append(sink.write_staged(late_table, "late", partition, epoch, wm))
        rows_out["late"] = late_table.num_rows

    # 2. window/join kernels over the residual row layout
    residual_rows = to_residual_rows(relay_out)
    for op_name, params in cfg.operators.items():
        kernel = WINDOW_OPERATORS[op_name]
        out, op_state = kernel(residual_rows, state.get(op_name, {}), flush=flush, **params)
        state[op_name] = op_state
        if out.num_rows:
            files.append(sink.write_staged(out, op_name, partition, epoch, wm))
        rows_out[op_name] = out.num_rows

    state_path = store.save_state(epoch, partition, state)
    return {
        "partition": partition,
        "epoch": epoch,
        "rows_in": rows_in,
        "watermark_us": wm,
        "state_path": state_path,
        "files": files,
        "rows_out": rows_out,
    }


def _empty_feed_table() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([], type=pa.string()),
            "turn_idx": pa.array([], type=pa.int32()),
            "role": pa.array([], type=pa.string()),
            "text": pa.array([], type=pa.string()),
            "tool": pa.array([], type=pa.string()),
            "ts": pa.array([], type=pa.timestamp("us")),
        }
    )


@ray.remote
def _flush_partition_task(partition, epoch, prev, cfg):
    return process_partition(None, partition, epoch, prev, cfg, flush=True)


class StreamingJob:
    """Driver facade with dstream's lifecycle verbs
    (cmd/init.go, cmd/plan.go, cmd/status.go, cmd/destroy.go analogs)."""

    def __init__(self, cfg: StreamingConfig):
        self.cfg = cfg
        self.store = CheckpointStore(cfg.checkpoint_dir)
        self.sink = ExactlyOnceParquetSink(cfg.sink_dir)

    # -- lifecycle verbs ---------------------------------------------------
    def init(self) -> dict:
        self.store.init()
        self.sink.init()
        return {"status": "ready", "out_dir": self.cfg.out_dir}

    def plan(self) -> dict:
        cursor = self._file_cursor()
        pending = self.discover_files()[cursor:]
        return {"pending_files": pending, "file_cursor": cursor}

    def status(self) -> dict:
        last = self.store.last_committed()
        if last is None:
            return {"committed_epochs": 0}
        epoch, manifest = last
        return {
            "committed_epochs": epoch + 1,
            "file_cursor": manifest["file_cursor"],
            "flushed": manifest.get("flushed", False),
            "totals": manifest.get("totals", {}),
            "partitions": len(manifest.get("partitions", {})),
        }

    def destroy(self) -> dict:
        self.store.destroy()
        self.sink.destroy()
        import shutil

        shutil.rmtree(self.cfg.out_dir, ignore_errors=True)
        return {"status": "destroyed"}

    # -- feed discovery ----------------------------------------------------
    def discover_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.cfg.feed_dir, "*.parquet")))

    def _file_cursor(self) -> int:
        last = self.store.last_committed()
        return int(last[1]["file_cursor"]) if last else 0

    def _prev_partitions(self) -> dict[str, dict]:
        last = self.store.last_committed()
        return dict(last[1].get("partitions", {})) if last else {}

    # -- epoch execution ---------------------------------------------------
    def run_epoch(self, files: list[str], *, flush: bool = False) -> dict:
        """One micro-batch: process `files` (possibly empty for a flush-only
        epoch) through every partition, two-phase-commit the results."""
        last = self.store.last_committed()
        epoch = (last[0] + 1) if last else 0
        prev_parts = self._prev_partitions()
        cfg = self.cfg
        t0 = time.time()

        results: list[dict] = []
        if files:
            ds = rd.read_parquet(files)

            def add_part(batch: pa.Table) -> pa.Table:
                pid = partition_ids(batch["conv_id"], cfg.num_partitions)
                return batch.append_column("partition_id", pa.array(pid))

            ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)

            def run_group(group: pa.Table) -> pa.Table:
                partition = int(group["partition_id"][0].as_py())
                prev = prev_parts.get(str(partition), {})
                res = process_partition(
                    group, partition, epoch, prev, cfg, flush=flush
                )
                return pa.table({"result": pa.array([json.dumps(res)])})

            out = ds.groupby("partition_id").map_groups(
                run_group, batch_format="pyarrow"
            )
            results = [json.loads(r["result"]) for r in out.take_all()]
        if flush:
            seen = {r["partition"] for r in results}
            refs = [
                _flush_partition_task.remote(
                    int(k), epoch, prev_parts[k], cfg
                )
                for k in prev_parts
                if int(k) not in seen
            ]
            results.extend(ray.get(refs))

        # phase 2: promote staged files, then commit the manifest (atomic)
        all_files = [f for r in results for f in r["files"]]
        ExactlyOnceParquetSink.promote(all_files)

        partitions = dict(prev_parts)  # carry forward idle partitions
        for r in results:
            k = str(r["partition"])
            prev = prev_parts.get(k, {})
            cum_in = int(prev.get("rows_in_total", 0)) + r["rows_in"]
            cum_out = dict(prev.get("rows_out_total", {}))
            for op, n in r["rows_out"].items():
                cum_out[op] = cum_out.get(op, 0) + n
            partitions[k] = {
                "watermark_us": r["watermark_us"],
                "state_path": r["state_path"],
                "rows_in_total": cum_in,
                "rows_out_total": cum_out,
                "last_epoch": epoch,
                "files": r["files"],  # lineage: this epoch's sink files
            }
        totals = {
            "rows_in": sum(r["rows_in"] for r in results),
            "rows_out": {
                op: sum(r["rows_out"].get(op, 0) for r in results)
                for op in set().union(*(r["rows_out"] for r in results))
            }
            if results
            else {},
        }
        manifest = {
            "epoch": epoch,
            "file_cursor": self._file_cursor() + len(files),
            "flushed": flush,
            "wall_s": round(time.time() - t0, 3),
            "partitions": partitions,
            "totals": totals,
        }
        self.store.commit(epoch, manifest)
        return manifest

    def run(
        self,
        *,
        max_epochs: int | None = None,
        flush_at_end: bool = True,
    ) -> dict:
        """Consume the feed from the committed cursor to its current end."""
        self.init()
        self.store.gc_uncommitted()
        n = 0
        while max_epochs is None or n < max_epochs:
            cursor = self._file_cursor()
            pending = self.discover_files()[cursor:]
            if not pending:
                break
            batch = pending[: self.cfg.files_per_epoch]
            is_last = len(pending) <= self.cfg.files_per_epoch
            self.run_epoch(batch, flush=flush_at_end and is_last)
            n += 1
        last = self.store.last_committed()
        if flush_at_end and last and not last[1].get("flushed", False):
            self.run_epoch([], flush=True)
        return self.status()


def main(argv=None):  # pragma: no cover - CLI drive path
    import argparse

    p = argparse.ArgumentParser(description="dstream_ray streaming epoch runner")
    p.add_argument("verb", choices=["run", "init", "plan", "status", "destroy"])
    p.add_argument("--feed-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--partitions", type=int, default=8)
    p.add_argument("--files-per-epoch", type=int, default=2)
    p.add_argument("--max-epochs", type=int, default=None)
    args = p.parse_args(argv)
    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        rd.DataContext.get_current().enable_progress_bars = False
    job = StreamingJob(
        StreamingConfig(
            feed_dir=args.feed_dir,
            out_dir=args.out_dir,
            num_partitions=args.partitions,
            files_per_epoch=args.files_per_epoch,
        )
    )
    out = getattr(job, args.verb)() if args.verb != "run" else job.run(
        max_epochs=args.max_epochs
    )
    print(json.dumps(out, indent=1, default=str))
    ray.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
