"""Multi-host initialization.

The reference's multi-process story is PyTorch-Lightning DDP spawn +
torch.distributed rank queries in the sampler (SURVEY.md §2.8). The
TPU-native equivalent is one call to `jax.distributed.initialize()` before
any jax use on each host: after it, `jax.devices()` spans every chip of the
slice (ICI) / pod (DCN), the same Mesh code in mesh.py covers all of them,
and the jitted train step's psum rides the fabric with no further code.

Host-local data sharding mirrors the reference's InfiniteSampler rank split
(data/sampling.py:61-71): TrainLoader(shard=jax.process_index(),
num_shards=jax.process_count()) — already wired in train/trainer.py.
"""

from __future__ import annotations

import os

from vision_kit_tpu.utils.logging_utils import logger


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize multi-host jax if this looks like a multi-host launch.

    On TPU pods the runtime autodetects everything and the arguments stay
    None; for manual launches pass them or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID. Returns True when distributed mode
    was initialized, False for single-host runs (no-op).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    on_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (coordinator_address or on_pod):
        return False

    try:
        if coordinator_address:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            # pod autodetection path: no arguments
            jax.distributed.initialize()
    except Exception as e:
        # pod-looking env without a reachable coordinator (e.g. a tunneled
        # single chip): stay single-host rather than failing the run
        logger.warning("multi-host init skipped: %s", e)
        return False
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
