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
