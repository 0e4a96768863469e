"""Multi-host helpers (single-process semantics + record sharding) and full
train-state resume."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.parallel import mesh as mesh_lib
from show_and_tell_tpu.parallel.distributed import globalize_batch, host_shard_info
from show_and_tell_tpu.train.step import make_train_state, make_train_step
from show_and_tell_tpu.utils.vocab import Vocabulary


from tests.test_data import _records as _data_records


def _records(n=12):
    # shared synthetic-record factory (tests/test_data.py) with the fixed
    # caption length this file's shard-math assertions assume
    recs = _data_records(n)
    for r in recs:
        r["final_caption"] = ["w"] * 3
    return recs


def test_host_shard_partitions_records():
    vocab = Vocabulary.from_words(["w"])
    shards = [
        CocoCaptionDataset(_records(), vocab, host_shard=(i, 3)).data for i in range(3)
    ]
    ids = sorted(r["imgid"] for s in shards for r in s)
    assert ids == list(range(12))  # disjoint cover
    assert all(len(s) == 4 for s in shards)
    # host_shard=None or count 1 keeps everything
    assert len(CocoCaptionDataset(_records(), vocab, host_shard=(0, 1)).data) == 12


def test_host_shard_info_single_process():
    assert host_shard_info() == (0, 1)


def test_globalize_batch_single_process_matches_shard_batch():
    mesh = mesh_lib.make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    g = globalize_batch(mesh, batch)
    s = mesh_lib.shard_batch(mesh, batch)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(s["x"]))
    assert len(g["x"].addressable_shards) == 8


def test_full_train_state_resume(tmp_path):
    cfg = Config(embed_size=16, hidden_size=32, crop_size=32)
    model = build_model(cfg, 9)
    params, frozen = model.init(jax.random.PRNGKey(0))
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    batch = {
        "captions": np.ones((4, 5), np.int32),
        "lengths": np.full((4,), 5, np.int32),
        "features": np.random.default_rng(0).random((4, 4, 512)).astype(np.float32),
    }
    for i in range(3):
        state, _ = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(i))
    ckpt.save_train_state(str(tmp_path), state)

    template = make_train_state(cfg, jax.tree.map(jnp.zeros_like, params))
    restored = ckpt.load_train_state(str(tmp_path), template)
    assert restored is not None
    assert int(restored.step) == 3
    # Adam moments restored bit-exact -> next step matches exactly
    s1, m1 = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(9))
    s2, m2 = step(restored, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
