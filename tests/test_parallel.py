"""SPMD tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.parallel import mesh as mesh_lib
from show_and_tell_tpu.train.step import make_train_state, make_train_step

V = 19


def small_cfg(**kw):
    base = dict(embed_size=16, hidden_size=32, num_layers=1, crop_size=32)
    base.update(kw)
    return Config(**base)


def _sat_batch(B=8, T=6, L=4):
    k = jax.random.PRNGKey(0)
    captions = jax.random.randint(k, (B, T), 4, V).astype(jnp.int32).at[:, 0].set(1)
    return {
        "captions": np.asarray(captions),
        "lengths": np.full((B,), T, np.int32),
        "features": np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, L, 512))),
    }


def test_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = mesh_lib.make_mesh(model_parallel=2)
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2


def test_shard_batch_layout():
    m = mesh_lib.make_mesh()
    batch = mesh_lib.shard_batch(m, _sat_batch())
    shards = batch["features"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 1  # 8-way batch split


def _run_steps(mesh, n_steps=3, model_parallel=1):
    cfg = small_cfg(model_parallel=model_parallel)
    model = build_model(cfg, V)
    params, frozen = model.init(jax.random.PRNGKey(0))
    params = mesh_lib.place_params(mesh, params)
    frozen = mesh_lib.replicate(mesh, frozen)
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    batch = mesh_lib.shard_batch(mesh, _sat_batch())
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    return losses, state


def test_dp8_matches_single_device():
    """Gradient psum over the data axis must reproduce single-device math."""
    mesh8 = mesh_lib.make_mesh()  # 8-way DP
    mesh1 = mesh_lib.make_mesh(num_devices=1)
    l8, _ = _run_steps(mesh8)
    l1, _ = _run_steps(mesh1)
    np.testing.assert_allclose(l8, l1, rtol=2e-4)


def test_tensor_parallel_classifier():
    """model axis = 2: vocab-dim params shard; training still runs."""
    mesh = mesh_lib.make_mesh(model_parallel=2)
    cfg = small_cfg(model_parallel=2)
    # EVEN vocab so the vocab-dim sharding branch actually executes — with
    # an odd vocab every param falls back to replication and this test
    # would pass with param_shardings' model-axis logic deleted
    V_even = V + (V % 2)
    model = build_model(cfg, V_even)
    params, _ = model.init(jax.random.PRNGKey(0))
    sh = mesh_lib.param_shardings(mesh, params)
    # classifier w [E, V] must be sharded on its last (vocab) dim iff divisible
    assert sh["classifier"]["w"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["embed"].spec == jax.sharding.PartitionSpec("model", None)
    # non-vocab params stay replicated
    assert sh["lstm"]["w"].spec == jax.sharding.PartitionSpec()
    losses, _ = _run_steps(mesh, model_parallel=2)
    assert np.isfinite(losses).all()


def test_loss_decreases_under_dp():
    losses, _ = _run_steps(mesh_lib.make_mesh(), n_steps=10)
    assert losses[-1] < losses[0]
