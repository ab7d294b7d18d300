"""Iteration checkpointing with per-partition lineage.

The reference has no checkpointing (single JVM, ``SURVEY.md §4.1``); the north
rule requires a killed job to resume mid-algorithm.  Protocol:

- each shard writes its vertex-state Parquet atomically
  (``iter=<k>.part=<p>.parquet``, temp + rename — ``shards.py save_state``),
- the driver then atomically swaps ``manifest.json`` naming the completed
  iteration, the partitioning (bounds), convergence delta and the state files
  — a manifest only ever points at fully-written iterations,
- resume: read manifest, rebuild shard actors from the (immutable) partitioned
  edge Parquet, load the named state files, continue the loop.

Old iterations are pruned (keep last 2) so checkpoint size is O(2 x V).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def atomic_save_table(table: pa.Table, ckpt_dir: str, iteration: int, part: int) -> str:
    """Write one shard's state parquet atomically (temp + rename); the file
    only becomes visible under its manifest-addressable name when complete."""
    os.makedirs(ckpt_dir, exist_ok=True)
    final = os.path.join(ckpt_dir, f"iter={iteration:06d}.part={part:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)
    return final


def part_of(path: str) -> int:
    """Partition number encoded in a state file's NAME (``iter=..part=<p>..``).
    Parses the basename only — a checkpoint *directory* containing ``part=``
    (e.g. a Hive-partitioned data tree) must not confuse the parse."""
    return int(os.path.basename(path).split("part=")[1].split(".")[0])


def files_by_part(files) -> dict[int, str]:
    """Map partition number -> state file for one manifest's file list."""
    return {part_of(f): f for f in files}


def rehydrate_shard(shard, ckpt_dir: str | None, algo: str) -> int:
    """Post-restart warm start: load ``shard.part``'s state file from the
    latest committed manifest under ``ckpt_dir`` (if any, and only if its
    partitioning matches).  Returns the restored iteration, or -1.

    Used from shard ``__init__`` so a Ray ``max_restarts`` revival comes back
    with checkpoint state instead of pristine state; the driver still rolls
    the WHOLE pool back to one manifest on detection (state/failover.py)."""
    if not ckpt_dir:
        return -1
    m = CheckpointManager(ckpt_dir, algo).latest()
    if m is None:
        return -1
    if [int(b) for b in m.get("bounds", [])] != [int(b) for b in shard.bounds]:
        return -1
    for f in m["files"]:
        if part_of(f) == shard.part and os.path.exists(f):
            shard.load_state(f)
            return int(m["iteration"])
    return -1


class CheckpointManager:
    def __init__(self, ckpt_dir: str, algo: str, keep: int = 2):
        self.dir = os.path.join(ckpt_dir, algo)
        os.makedirs(self.dir, exist_ok=True)
        self.keep = keep

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def latest(self) -> dict | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    def validate_resume(self, manifest: dict, *, algo: str, bounds) -> None:
        """Refuse to resume from a checkpoint of a different graph/algorithm.

        A manifest from another graph with the same P and partition sizes
        would otherwise pass the shards' row-count asserts and silently
        resume with wrong per-vid state.
        """
        got_algo = manifest.get("algo")
        if got_algo != algo:
            raise ValueError(
                f"checkpoint is for algo {got_algo!r}, cannot resume {algo!r} from it"
            )
        want = [int(b) for b in bounds]
        got = [int(b) for b in manifest.get("bounds", [])]
        if got != want:
            raise ValueError(
                "checkpoint partition bounds do not match this graph "
                f"(checkpoint {got[:4]}...x{len(got)} vs graph {want[:4]}...x{len(want)}); "
                "it was written for a different graph or partitioning"
            )

    def reset(self) -> None:
        """Clear any previous run's checkpoint under this ``(dir, algo)``.

        Drivers call this on a FRESH (``resume=False``) run BEFORE spawning
        shard actors: shards warm-start in ``__init__`` via
        ``rehydrate_shard`` (the ``max_restarts`` failover path) and the
        mid-run ``rollback_pool`` reads ``latest()`` — either would silently
        load a *previous* run's committed state into a run whose driver
        starts at iteration 0, compounding iterations on converged state.
        """
        try:
            os.remove(self.manifest_path)
        except FileNotFoundError:
            pass
        for f in glob.glob(os.path.join(self.dir, "iter=*.parquet")):
            try:
                os.remove(f)
            except OSError:
                pass

    def commit_iteration(self, iteration: int, files: list[str], meta: dict):
        m = {"iteration": iteration, "files": sorted(files), **meta}
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self.manifest_path)
        self._prune(iteration)

    def _prune(self, current_iteration: int):
        for f in glob.glob(os.path.join(self.dir, "iter=*.parquet")):
            it = int(os.path.basename(f).split(".")[0].split("=")[1])
            if it <= current_iteration - self.keep:
                try:
                    os.remove(f)
                except OSError:
                    pass

    def state_dir(self) -> str:
        return self.dir
