"""Multi-host (multi-process) scaling support.

Single-host multi-chip needs nothing beyond ``make_mesh`` — ``jax.devices()``
covers the whole slice. Across hosts (v5e pods, DCN-connected slices):

1. each process calls :func:`initialize` first (JAX distributed runtime),
2. ``make_mesh`` then sees the *global* device set and lays the ``data``
   axis out over all chips,
3. the dataset shards records per host (``CocoCaptionDataset(host_shard=
   host_shard_info())``) so input IO scales with hosts,
4. :func:`globalize_batch` assembles each host's local batch into a global
   ``jax.Array`` sharded over the mesh ``data`` axis
   (``make_array_from_process_local_data``) — the jitted SPMD step is then
   identical to the single-host one; gradient psum rides ICI within a slice
   and DCN between slices, both inserted by XLA.

The reference has no multi-host story at all (single-process DataParallel,
train.py:44).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import jax

from show_and_tell_tpu.parallel import mesh as mesh_lib

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the JAX distributed runtime (no-op if already initialised).

    With explicit arguments, failures are REAL errors and propagate — a
    process that was told to join a 2-process job must not silently run
    single-process. Only the no-argument auto-detection path may fall back
    (non-cluster environment), and it logs the reason.

    NB: must be called before anything that initialises the XLA backend;
    the already-initialised check deliberately avoids jax.process_count()
    (which would itself initialise the backend and poison the runtime)."""
    if jax.distributed.is_initialized():
        return
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise
        log.info("jax.distributed auto-detection unavailable (%s); single-process", e)


def host_shard_info() -> Tuple[int, int]:
    """(process_index, process_count) — feed to the dataset's host_shard."""
    return jax.process_index(), jax.process_count()


def globalize_batch(mesh, local_batch: Any) -> Any:
    """Per-host local batch -> global data-sharded jax.Array tree.

    On a single process this is exactly ``shard_batch``."""
    if jax.process_count() == 1:
        return mesh_lib.shard_batch(mesh, local_batch)
    sharding = mesh_lib.batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), local_batch
    )
