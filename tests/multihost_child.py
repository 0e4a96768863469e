"""Child process for the 2-process multi-host test (tests/test_multihost.py).

Each process: jax.distributed.initialize (gloo CPU collectives) ->
global mesh over 2x2 virtual devices -> host-sharded dataset slice ->
globalize_batch -> ONE real SPMD train step. Prints a line the parent
asserts on: loss must be identical across processes (the psum rides the
cross-process collective) and each host must see only its record shard.
"""

import sys

sys.path.insert(0, sys.argv[4] if len(sys.argv) > 4 else ".")

import jax

jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from show_and_tell_tpu.parallel.distributed import (  # noqa: E402
    globalize_batch,
    host_shard_info,
    initialize,
)

initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid)

import numpy as np  # noqa: E402

from show_and_tell_tpu.config import Config  # noqa: E402
from show_and_tell_tpu.models.registry import build_model  # noqa: E402
from show_and_tell_tpu.parallel import mesh as mesh_lib  # noqa: E402
from show_and_tell_tpu.train.step import make_train_state, make_train_step  # noqa: E402

idx, cnt = host_shard_info()
assert cnt == nprocs, (idx, cnt)

mesh = mesh_lib.make_mesh()  # all global devices on the data axis
n_global = mesh.devices.size

V = 32
cfg = Config(embed_size=16, hidden_size=32, num_layers=1, crop_size=32)
model = build_model(cfg, V)
params, frozen = model.init(jax.random.PRNGKey(0))
params = mesh_lib.place_params(mesh, params)
frozen = mesh_lib.replicate(mesh, frozen)
state = make_train_state(cfg, params)
step = make_train_step(model, cfg, donate=False)

# deterministic global batch, split per host: host i takes rows [i::cnt]
B_global, T, L = 2 * n_global, 6, 4
rng = np.random.default_rng(0)
feats = rng.standard_normal((B_global, L, 512)).astype(np.float32)
caps = rng.integers(4, V, (B_global, T)).astype(np.int32)
caps[:, 0] = 1
lengths = np.full((B_global,), T, np.int32)
local = {
    "features": feats[idx::cnt],
    "captions": caps[idx::cnt],
    "lengths": lengths[idx::cnt],
}
batch = globalize_batch(mesh, local)
state, metrics = step(state, frozen, batch, 1e-3, 0.0, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
print(
    f"MHCHILD pid={idx}/{cnt} global_devices={n_global} "
    f"local_devices={len(jax.local_devices())} loss={loss:.6f}",
    flush=True,
)
