"""Device mesh + sharding layout — the SPMD replacement for DataParallel.

The reference scales with single-process ``nn.DataParallel`` (train.py:43-44):
replicate the module, scatter the batch over CUDA devices, gather outputs,
NCCL under the hood. The TPU-native design is SPMD over a
``jax.sharding.Mesh`` with two axes:

- ``data``: batch data parallelism — the batch dim of images/captions is
  sharded; parameters are replicated; XLA emits the gradient all-reduce
  (psum) over ICI automatically. This is the capability-parity axis
  (SURVEY.md §2.3: DP is the only parallelism the reference has).
- ``model``: reserved tensor-parallel axis so DP today doesn't preclude TP
  later (SURVEY.md §5 comms note). ``param_shardings`` places the
  vocabulary-dimension of the output projection / embedding on it when
  ``model_parallel > 1`` — the natural TP split for a captioner, since the
  vocab projection dominates trainable parameter count.

One ``jit``-compiled step sees sharded inputs + sharding-annotated params and
XLA inserts all collectives; there is no hand-written communication."""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = num_devices if num_devices > 0 else len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: requested {n} devices but the JAX backend "
            f"({devices[0].platform if devices else 'none'}) has only "
            f"{len(devices)}. For CPU testing, set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before "
            f"jax initializes (see tests/conftest.py)."
        )
    devices = devices[:n]
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _single_device(mesh: Mesh):
    """On a 1-device mesh, plain placement — identical semantics, and it
    avoids the (observed) heavy per-step overhead NamedSharding layouts incur
    on single-chip relay backends."""
    return mesh.devices.size == 1


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array leaf with its batch dim sharded over ``data``."""
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, batch)
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, tree)
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def _is_vocab_dim_param(path: str, shape) -> Optional[int]:
    """Returns the axis index to shard over ``model``, or None.

    Vocab-dimension tensors: output heads ``out``/``classifier`` (w: [H, V],
    b: [V]) and the embedding table ([V, E])."""
    if "out" in path or "classifier" in path:
        return len(shape) - 1  # last dim is vocab
    if "embed" in path:
        return 0
    return None


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Sharding tree for the trainable params.

    Replicated everywhere except (when the mesh has a real ``model`` axis)
    the vocab dims of embedding/output-projection, which go tensor-parallel.
    """
    tp = mesh.shape[MODEL_AXIS] > 1

    def one(path, x):
        if tp:
            pstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            ax = _is_vocab_dim_param(pstr, x.shape)
            if ax is not None and x.shape[ax] % mesh.shape[MODEL_AXIS] == 0:
                spec = [None] * x.ndim
                spec[ax] = MODEL_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def place_params(mesh: Mesh, params: Any) -> Any:
    if _single_device(mesh):
        return jax.tree.map(jax.device_put, params)
    shardings = param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
