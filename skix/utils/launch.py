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
        if not coordinator:
            raise ValueError(
                "SKIX_NUM_PROCESSES > 1 requires SKIX_COORDINATOR "
                "(host:port of process 0)")
        already = getattr(initialize_distributed, "_initialized", False)
        if already:
            log.info("jax.distributed already initialized — skipping")
        elif os.environ.get("SKIX_FAKE_RENDEZVOUS"):
            log.info("SKIX_FAKE_RENDEZVOUS set — skipping the real "
                     "jax.distributed rendezvous (tests/smoke only)")
        else:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
            initialize_distributed._initialized = True
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
    """``python -m skix.utils.launch <stage> --shard-root=<dir> [k=v ...]``

    Rendezvous (if SKIX_NUM_PROCESSES/SKIX_COORDINATOR configured), shard
    the person directories under ``--shard-root`` across processes, and
    run the stage CLI restricted to this process's share via the
    ``only_persons`` override (every person-iterating stage honors it
    through skix.config.iter_person_dirs). Without ``--shard-root`` the
    stage runs unsharded (single host / file-level skip-if-exists)."""
    import importlib
    import sys
    from pathlib import Path

    args = list(sys.argv[1:] if argv is None else argv)
    if not args:
        raise SystemExit("usage: python -m skix.utils.launch <stage> "
                         "[--shard-root=DIR] [overrides...]")
    stage = args[0]
    overrides = []
    shard_root = os.environ.get("SKIX_SHARD_ROOT")
    for a in args[1:]:
        if a.startswith("--shard-root="):
            shard_root = a.split("=", 1)[1]
        else:
            overrides.append(a)
    info = initialize_distributed()
    if shard_root and info["num_processes"] > 1:
        persons = [d.name for d in sorted(Path(shard_root).iterdir())
                   if d.is_dir()]
        mine = shard_work(persons, info["process_id"],
                          info["num_processes"])
        if not mine:
            log.info("process %d: no persons in its share — exiting",
                     info["process_id"])
            return
        overrides.append("only_persons=" + ",".join(mine))
        log.info("process %d/%d handles persons: %s", info["process_id"],
                 info["num_processes"], ",".join(mine))
    log.info("launching stage %s on process %d/%d (%d devices)", stage,
             info["process_id"], info["num_processes"], info["n_devices"])
    mod = importlib.import_module(f"skix.pipelines.{stage}")
    mod.main(overrides)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
