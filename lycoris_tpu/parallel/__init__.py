"""lycoris_tpu.parallel — pjit/GSPMD sharded fine-tune path (SURVEY §2.4).

Single-program multi-host: call :func:`init_distributed` once per process
before any jax op; build a mesh with :func:`sharding.make_mesh` (ICI handles
intra-slice axes; put DCN-crossing axes outermost — data parallelism across
slices, model parallelism within).
"""

from __future__ import annotations


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed for multi-host TPU slices.

    No-ops on single-process setups; arguments default to the TPU pod
    environment variables (MEGASCALE/Cloud-TPU metadata) that
    ``jax.distributed.initialize`` auto-detects.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


from . import sharding  # noqa: E402,F401
