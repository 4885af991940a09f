"""Long-run segmentation: checkpoint + re-exec across the tunnel leak.

The axon tunnel runtime retains ~100% of every host->device transfer in
host RSS (measured, tools/leak_probe.py: 57 MB retained per 59 MB
transferred; gc / jax.clear_caches / malloc_trim reclaim nothing; the
no-transfer control is flat).  Nothing in-process can free it, so runs
long enough to exhaust host RAM are fenced by *segmentation*: when RSS
crosses a threshold at an epoch boundary, the trainer saves a segment
checkpoint (train state + optimizer + RNG + eval history + the sampler's
epoch cursor) and the driving tool re-execs itself; on restart the
segment file resumes the run mid-stream.  Batch streams are reproducible
across the restart because samplers derive each epoch's RNG from
(seed, epoch) alone (sampler/samplers.py:_epoch_iter).

The companion mitigation is device-side batch caching for deterministic
loaders (train/loop.py): the eval loader and the exact control's single
full-graph train batch re-transfer identical bytes every epoch — caching
them on device removes that leak entirely (and the 0.5-20 MB/s tunnel
re-transfer time with it).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, List, Optional, Tuple

import numpy as np


class SegmentRestart(Exception):
    """Raised after a segment checkpoint is written; the driving tool
    should re-exec the process (``reexec()``)."""

    def __init__(self, path: str, epoch: int):
        super().__init__(f"segment saved at epoch {epoch}: {path}")
        self.path = path
        self.epoch = epoch


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def max_rss_mb_default() -> float:
    """Default RSS ceiling: VQ_GNN_MAX_RSS_MB, else 60 GB (the host has
    125 GB; the margin absorbs one epoch of transfers + prepare())."""
    return float(os.environ.get("VQ_GNN_MAX_RSS_MB", "60000"))


def save_segment(
    path: str,
    state: Any,
    epoch: int,
    history: List[Tuple],
    rng: Optional[np.ndarray] = None,
    extra: Optional[dict] = None,
) -> None:
    from vq_gnn_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(path, state, step=epoch)
    meta = {
        "epoch": epoch,
        "history": [list(map(float, h)) for h in history],
        "rng": None if rng is None else np.asarray(rng).tolist(),
        "extra": extra or {},
    }
    tmp = path + ".meta.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path + ".meta.json")


def load_segment(path: str, template_state: Any):
    """-> (state, epoch, history, rng, extra) or None if no segment."""
    from vq_gnn_tpu.train.checkpoint import restore_checkpoint

    if not (os.path.exists(path) and os.path.exists(path + ".meta.json")):
        return None
    state = restore_checkpoint(path, template_state)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    rng = None if meta["rng"] is None else np.asarray(meta["rng"], np.uint32)
    history = [tuple(h) for h in meta["history"]]
    return state, int(meta["epoch"]), history, rng, meta.get("extra", {})


def clear_segment(path: str) -> None:
    for p in (path, path + ".meta.json"):
        if os.path.exists(p):
            os.remove(p)


def reexec() -> None:
    """Replace the process image with a fresh invocation of the same
    command line — the only way to return the tunnel's retained transfer
    buffers to the OS."""
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)
