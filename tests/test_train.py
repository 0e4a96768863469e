"""Trainer runtime: schedules, checkpoint gating, resume, histories."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.train.schedule import lr_for_epoch, ss_prob_for_epoch
from show_and_tell_tpu.train.trainer import Trainer

V = 19


def test_lr_schedule_matches_reference_formula():
    # train.py:101-107: decay by rate^((epoch-start)//every) once epoch > start
    cfg = Config(
        learning_rate=1e-3,
        learning_rate_decay_start=1,
        learning_rate_decay_every=3,
        learning_rate_decay_rate=0.8,
    )
    assert lr_for_epoch(cfg, 1) == 1e-3
    assert lr_for_epoch(cfg, 2) == pytest.approx(1e-3 * 0.8 ** 0)
    assert lr_for_epoch(cfg, 4) == pytest.approx(1e-3 * 0.8 ** 1)
    assert lr_for_epoch(cfg, 7) == pytest.approx(1e-3 * 0.8 ** 2)
    assert lr_for_epoch(Config(learning_rate_decay_start=-1), 10) == 1e-3
    # decay_start=0 is valid (decay from the first epoch boundary) — only -1
    # disables; a >=1 guard silently turned it off (review regression)
    cfg0 = cfg.replace(learning_rate_decay_start=0)
    assert lr_for_epoch(cfg0, 1) == pytest.approx(1e-3 * 0.8 ** 0)
    assert lr_for_epoch(cfg0, 3) == pytest.approx(1e-3 * 0.8 ** 1)


def test_ss_schedule():
    cfg = Config(
        scheduled_sampling_start=2,
        scheduled_sampling_increase_every=5,
        scheduled_sampling_increase_prob=0.05,
        scheduled_sampling_max_prob=0.25,
    )
    assert ss_prob_for_epoch(cfg, 1) == 0.0
    assert ss_prob_for_epoch(cfg, 3) == 0.0  # (3-2)//5 = 0
    assert ss_prob_for_epoch(cfg, 7) == pytest.approx(0.05)
    assert ss_prob_for_epoch(cfg, 100) == 0.25
    assert ss_prob_for_epoch(Config(), 100) == 0.0  # default off


def _loader(n_batches=4, B=8, T=6, L=4):
    batches = []
    for i in range(n_batches):
        k = jax.random.PRNGKey(i)
        captions = (
            jax.random.randint(k, (B, T), 4, V).astype(jnp.int32).at[:, 0].set(1)
        )
        batches.append(
            {
                "captions": np.asarray(captions),
                "lengths": np.full((B,), T, np.int32),
                "features": np.asarray(
                    jax.random.normal(jax.random.fold_in(k, 1), (B, L, 512))
                ),
            }
        )
    return batches


def small_cfg(tmp_path, **kw):
    base = dict(
        embed_size=16,
        hidden_size=32,
        num_layers=1,
        crop_size=32,
        max_epochs=2,
        save_checkpoint_every=4,
        log_step=2,
        expr_dir=str(tmp_path),
        language_eval=0,
    )
    base.update(kw)
    return Config(**base)


def test_trainer_end_to_end(tmp_path):
    cfg = small_cfg(tmp_path)
    model = build_model(cfg, V)
    evals = []

    def eval_fn(params, batch_stats, frozen):
        evals.append(1)
        return 2.0, [{"image_id": 1, "caption": "a"}], {}

    t = Trainer(cfg, model, _loader(), eval_fn=eval_fn)
    t.train()
    # 2 epochs x 4 batches = 8 iters; checkpoint every 4 -> 2 evals
    assert len(evals) == 2
    infos = ckpt.load_infos(cfg.expr_dir)
    assert infos["total_iter"] == 8
    assert infos["epoch"] == 2
    assert os.path.exists(os.path.join(cfg.expr_dir, "model-best.msgpack"))
    assert infos["best_val_score"] == -2.0  # language_eval=0 -> -val_loss gate
    assert len(infos["loss_history"]) == 2


def test_trainer_cider_gate(tmp_path):
    cfg = small_cfg(tmp_path, language_eval=1)
    model = build_model(cfg, V)
    scores = iter([0.5, 0.3])  # second eval is worse -> no new best

    def eval_fn(params, batch_stats, frozen):
        return 2.0, [], {"CIDEr": next(scores)}

    t = Trainer(cfg, model, _loader(), eval_fn=eval_fn)
    t.train()
    infos = ckpt.load_infos(cfg.expr_dir)
    best = ckpt.load_infos(cfg.expr_dir, best=True)
    assert infos["best_val_score"] == 0.5
    assert best["total_iter"] == 4  # best checkpoint from the first eval


def test_preemption_guard_signal_latch_and_restore():
    import os
    import signal

    from show_and_tell_tpu.train.preempt import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    g = PreemptionGuard()
    with g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGTERM)  # latched, not fatal
        assert g.triggered
        # one latch only (review fix): the FIRST signal restores the
        # previous handlers, so a second Ctrl+C/SIGTERM while the process
        # is hung outside the step loop kills it instead of being swallowed
        assert signal.getsignal(signal.SIGTERM) is prev
        assert signal.getsignal(signal.SIGINT) is prev_int
    assert signal.getsignal(signal.SIGTERM) is prev
    assert signal.getsignal(signal.SIGINT) is prev_int


class _KillAfter:
    """Loader that delivers a real SIGTERM while producing batch ``after``
    (0-based) — mimics the scheduler preempting mid-epoch."""

    def __init__(self, batches, after):
        self.batches, self.after = batches, after

    def __iter__(self):
        import os
        import signal

        for i, b in enumerate(self.batches):
            if i == self.after:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b


def test_preemption_resume_bit_continuous(tmp_path):
    """SIGTERM mid-epoch -> in-flight step finishes, full train state is
    saved, train() returns; resuming completes the run with final params
    BIT-identical to an uninterrupted one."""
    loader = _loader(n_batches=4)
    eval_fn = lambda *a: (1.0, [], {})  # noqa: E731

    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    cfg_a = small_cfg(dir_a, save_checkpoint_every=100)
    model = build_model(cfg_a, V)
    ta = Trainer(cfg_a, model, loader, eval_fn=eval_fn)
    ta.train()
    ref = jax.device_get(ta.state.params)

    # lookahead pulls batch 3 while step 2 runs, so the SIGTERM raised
    # producing batch index 2 lands after iteration 2 completes
    cfg_b = small_cfg(dir_b, save_checkpoint_every=100)
    tb = Trainer(cfg_b, model, _KillAfter(loader, after=2), eval_fn=eval_fn)
    infos = tb.train()
    assert infos["preempted"] is True
    assert infos["total_iter"] == 2 and infos["epoch"] == 1
    on_disk = ckpt.load_infos(dir_b)
    assert on_disk["preempted"] is True

    cfg_b2 = small_cfg(dir_b, save_checkpoint_every=100, start_from=dir_b)
    tb2 = Trainer(cfg_b2, model, loader, eval_fn=eval_fn)
    infos2 = tb2.train()
    assert infos2.get("preempted") is None  # consumed by the resume
    resumed = jax.device_get(tb2.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ref, resumed,
    )


def test_trainer_resume_skips_iterations(tmp_path):
    cfg = small_cfg(tmp_path, max_epochs=1)
    model = build_model(cfg, V)
    t = Trainer(cfg, model, _loader(), eval_fn=lambda *a: (1.0, [], {}))
    t.train()
    infos = ckpt.load_infos(cfg.expr_dir)
    assert infos["total_iter"] == 4

    # Resume in a fresh trainer from the same dir with more epochs.
    cfg2 = small_cfg(tmp_path, max_epochs=2, start_from=str(tmp_path))
    t2 = Trainer(cfg2, model, _loader(), eval_fn=lambda *a: (1.0, [], {}))
    t2.train()
    infos2 = ckpt.load_infos(cfg.expr_dir)
    # epoch 1 fully skipped (4 iters done), epoch 2 adds 4 more
    assert infos2["total_iter"] == 8
    assert infos2["epoch"] == 2


def test_trainer_resume_uses_loader_skip(tmp_path):
    """Loaders exposing set_resume_skip get the replay skip pushed down
    (no decode/transfer for already-trained batches); iteration numbering
    and totals are identical to the consume-and-discard fallback."""

    class SkippingLoader:
        def __init__(self, batches):
            self.batches = batches
            self.skip_calls = []
            self._skip = 0

        def set_epoch(self, epoch):
            pass

        def set_resume_skip(self, n):
            self.skip_calls.append(n)
            self._skip = n

        def __iter__(self):
            s, self._skip = self._skip, 0
            return iter(self.batches[s:])

    cfg = small_cfg(tmp_path, max_epochs=1)
    model = build_model(cfg, V)
    Trainer(cfg, model, SkippingLoader(_loader()), eval_fn=lambda *a: (1.0, [], {})).train()
    assert ckpt.load_infos(cfg.expr_dir)["total_iter"] == 4

    cfg2 = small_cfg(tmp_path, max_epochs=2, start_from=str(tmp_path))
    loader2 = SkippingLoader(_loader())
    Trainer(cfg2, model, loader2, eval_fn=lambda *a: (1.0, [], {})).train()
    assert loader2.skip_calls == [4]  # epoch 1 skipped at the loader level
    infos = ckpt.load_infos(cfg.expr_dir)
    assert infos["total_iter"] == 8
    assert infos["epoch"] == 2
    assert infos["iter"] == 4  # within-epoch numbering preserved


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg(tmp_path)
    model = build_model(cfg, V)
    params, _ = model.init(jax.random.PRNGKey(0))
    ckpt.save_best(str(tmp_path), params, None, {"total_iter": 1})
    tmpl = jax.tree.map(jnp.zeros_like, params)
    restored, _ = ckpt.load_best_params(str(tmp_path), tmpl, None)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_big_batch():
    """k microbatches of B/k under grad_accum_steps=k produce the same
    update one batch of B produces (clip/Adam see the averaged gradient;
    tolerance covers fp reduction-order noise through Adam's rsqrt —
    measured max 2.7e-5 against 1e-2-scale updates)."""
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs", "ball"])
    base = Config(embed_size=16, hidden_size=24, max_decode_len=6)
    model = build_model(base, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, L, T = 8, 5, 6
    feats = rng.standard_normal((B, L, 512)).astype(np.float32)
    caps, lens = vocab.encode_batch([["a", "dog", "runs", "ball"]] * B, T)

    def batch(sl):
        return {
            "features": jnp.asarray(feats[sl]),
            "captions": jnp.asarray(caps[sl]),
            "lengths": jnp.asarray(lens[sl]),
        }

    lr, key = 1e-2, jax.random.PRNGKey(1)

    s1 = make_train_state(base, params)
    step1 = make_train_step(model, base, donate=False)
    s1, m1 = step1(s1, frozen, batch(slice(None)), lr, 0.0, key)

    cfg_k = base.replace(grad_accum_steps=2)
    sk = make_train_state(cfg_k, params)
    stepk = make_train_step(model, cfg_k, donate=False)
    sk, ma = stepk(sk, frozen, batch(slice(0, 4)), lr, 0.0, key)
    # accumulation step: params must NOT move yet
    for a, b in zip(jax.tree.leaves(sk.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sk, mb = stepk(sk, frozen, batch(slice(4, 8)), lr, 0.0, key)

    for a, b in zip(jax.tree.leaves(sk.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # losses: microbatch losses average to the big-batch loss (equal lengths)
    np.testing.assert_allclose(
        (float(ma["loss"]) + float(mb["loss"])) / 2, float(m1["loss"]), rtol=1e-5
    )


def test_place_train_state_restores_tp_sharding(tmp_path):
    """Resume must re-place restored host arrays on the mesh: with
    model_parallel > 1 the vocab-sharded params AND their Adam moments
    come back from serialization as host numpy and previously stayed
    replicated (review fix), silently multiplying per-device HBM."""
    from show_and_tell_tpu.parallel import mesh as mesh_lib
    from show_and_tell_tpu.train.step import (
        make_train_state,
        make_train_step,
        place_train_state,
    )

    cfg = small_cfg(tmp_path, num_devices=8, model_parallel=2)
    vocab_size = 20  # divisible by the model axis so TP sharding applies
    model = build_model(cfg, vocab_size)
    mesh = mesh_lib.make_mesh(8, 2)
    params, frozen = model.init(jax.random.PRNGKey(0))
    params = mesh_lib.place_params(mesh, params)
    state = make_train_state(cfg, params)

    # simulate serialization.from_bytes: every leaf back to host numpy
    host_state = jax.tree.map(np.asarray, state)
    placed = place_train_state(mesh, cfg, host_state)

    def specs(tree):
        return jax.tree.map(lambda x: x.sharding, tree)

    assert specs(placed.params) == specs(state.params)
    # Adam moments mirror the param shardings exactly (the scalar count
    # leaf is replicated — the fresh state leaves it uncommitted, which
    # jit places freely, so only the moment trees are compared)
    assert specs(placed.opt_state[1].mu) == specs(placed.params)
    assert specs(placed.opt_state[1].nu) == specs(placed.params)
    # the whole point: at least one param is actually TP-sharded
    shardings = jax.tree.leaves(specs(placed.params))
    assert any(
        s.spec != jax.sharding.PartitionSpec() for s in shardings
    )

    # and the placed state runs a step without device mismatch errors
    B, T, L = 8, 6, 4
    step = make_train_step(model, cfg, donate=False)
    batch = mesh_lib.shard_batch(
        mesh,
        {
            "captions": np.ones((B, T), np.int32),
            "lengths": np.full((B,), T, np.int32),
            "features": np.zeros((B, L, 512), np.float32),
        },
    )
    frozen_r = mesh_lib.replicate(mesh, frozen)
    state2, m = step(placed, frozen_r, batch, 1e-3, 0.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_ema_polyak_average_tracked_and_checkpointed(tmp_path):
    """cfg.ema_decay > 0: the train state carries ema = d*ema + (1-d)*params
    (seeded at init), the recursion matches a hand computation, and
    save/load_train_state round-trips it bit-exactly."""
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs", "ball"])
    d = 0.5
    cfg = Config(embed_size=16, hidden_size=24, max_decode_len=6, ema_decay=d)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    B, L, T = 4, 5, 6
    batch = {
        "features": jnp.asarray(rng.standard_normal((B, L, 512)), jnp.float32),
    }
    caps, lens = vocab.encode_batch([["a", "dog", "runs", "ball"]] * B, T)
    batch["captions"], batch["lengths"] = jnp.asarray(caps), jnp.asarray(lens)

    state = make_train_state(cfg, params)
    jax.tree.map(  # seeded with the initial params
        lambda e, p: np.testing.assert_array_equal(np.asarray(e), np.asarray(p)),
        state.ema_params, params,
    )
    step = make_train_step(model, cfg, donate=False)
    key = jax.random.PRNGKey(1)
    s1, _ = step(state, frozen, batch, 1e-2, 0.0, key)
    expect1 = jax.tree.map(lambda p0, p1: d * p0 + (1 - d) * p1, params, s1.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s1.ema_params, expect1,
    )
    s2, _ = step(s1, frozen, batch, 1e-2, 0.0, key)
    expect2 = jax.tree.map(
        lambda e1, p2: d * e1 + (1 - d) * p2, expect1, s2.params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        s2.ema_params, expect2,
    )
    # the average lags the live params (they differ after two updates)
    assert not np.allclose(
        np.asarray(s2.ema_params["embed"]), np.asarray(s2.params["embed"])
    )

    # resume round trip carries the EMA tree bit-continuously
    expr = str(tmp_path / "expr")
    ckpt.save_train_state(expr, jax.device_get(s2))
    template = make_train_state(cfg, params)
    restored = ckpt.load_train_state(expr, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.ema_params, s2.ema_params,
    )

    # default (ema_decay=0) states carry None and serialize as before
    s_off = make_train_state(Config(embed_size=16, hidden_size=24), params)
    assert s_off.ema_params is None


def test_trainer_checkpoints_ema_weights(tmp_path):
    """With ema_decay on, the Trainer evaluates AND saves the averaged
    weights: the restored best checkpoint equals state.ema_params (which
    lags the live params)."""
    cfg = small_cfg(tmp_path, ema_decay=0.9)
    model = build_model(cfg, V)
    seen = []

    def eval_fn(params, batch_stats, frozen):
        seen.append(jax.device_get(params))
        return 2.0, [], {}

    t = Trainer(cfg, model, _loader(), eval_fn=eval_fn)
    t.train()
    assert t.state.ema_params is not None
    # eval_fn received the EMA tree, not the live params
    np.testing.assert_array_equal(
        seen[-1]["embed"], np.asarray(t.state.ema_params["embed"])
    )
    assert not np.allclose(
        seen[-1]["embed"], np.asarray(t.state.params["embed"])
    )
    # and the persisted best params are the averaged ones from the gate's
    # winning eval (the FIRST here: the constant eval score never improves,
    # so later checkpoints don't overwrite it)
    base_params, _ = model.init(jax.random.PRNGKey(0))
    restored = ckpt.load_best_params(cfg.expr_dir, base_params, None)
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(restored[0]["embed"]), seen[0]["embed"], atol=1e-6
    )


def test_ema_checkpoint_compatibility_matrix(tmp_path):
    """load_train_state bridges EMA across versions/configs (review fix:
    the new TrainState field made pre-EMA checkpoints unresumable):
    (a) a pre-EMA blob (no ema field) resumes with ema enabled — the
    average re-seeds from the restored params; (b) the same blob resumes
    with ema off; (c) a blob SAVED with an EMA resumes with ema_decay=0 —
    the stale average is dropped, not served forever."""
    from flax import serialization

    from show_and_tell_tpu.train.step import make_train_state

    cfg_off = Config(embed_size=16, hidden_size=24)
    cfg_on = cfg_off.replace(ema_decay=0.9)
    model = build_model(cfg_off, V)
    params, _ = model.init(jax.random.PRNGKey(0))

    # (a)+(b): fabricate a pre-EMA-era blob — the field absent entirely
    state_off = jax.device_get(make_train_state(cfg_off, params))
    legacy = serialization.to_state_dict(state_off)
    legacy.pop("ema_params")
    expr = str(tmp_path / "legacy")
    os.makedirs(expr, exist_ok=True)
    with open(os.path.join(expr, "state-last.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(legacy))

    tmpl_on = make_train_state(cfg_on, params)
    restored = ckpt.load_train_state(expr, tmpl_on)
    assert restored is not None and restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["embed"]), np.asarray(restored.params["embed"])
    )
    tmpl_off = make_train_state(cfg_off, params)
    restored_off = ckpt.load_train_state(expr, tmpl_off)
    assert restored_off is not None and restored_off.ema_params is None

    # (c): EMA-era blob, resumed with ema off -> stale average dropped
    state_on = jax.device_get(make_train_state(cfg_on, params))
    expr2 = str(tmp_path / "emaera")
    ckpt.save_train_state(expr2, state_on)
    restored2 = ckpt.load_train_state(expr2, make_train_state(cfg_off, params))
    assert restored2.ema_params is None
    # and resumed with ema ON it round-trips intact
    restored3 = ckpt.load_train_state(expr2, make_train_state(cfg_on, params))
    assert restored3.ema_params is not None


def test_ema_ticks_once_per_optimizer_update_under_accumulation():
    """grad_accum_steps=k: the EMA moves only on the k-th micro-step, so
    the per-UPDATE decay stays d (review fix: ticking every micro-step
    compounded it to d^k)."""
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs", "ball"])
    d, k = 0.5, 2
    cfg = Config(
        embed_size=16, hidden_size=24, max_decode_len=6,
        ema_decay=d, grad_accum_steps=k,
    )
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, L, T = 4, 5, 6
    caps, lens = vocab.encode_batch([["a", "dog", "runs", "ball"]] * B, T)
    batch = {
        "features": jnp.asarray(rng.standard_normal((B, L, 512)), jnp.float32),
        "captions": jnp.asarray(caps),
        "lengths": jnp.asarray(lens),
    }
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    key = jax.random.PRNGKey(1)
    s1, _ = step(state, frozen, batch, 1e-2, 0.0, key)
    # micro-step 1 of 2: no optimizer update, no EMA tick
    np.testing.assert_array_equal(
        np.asarray(s1.ema_params["embed"]), np.asarray(params["embed"])
    )
    np.testing.assert_array_equal(
        np.asarray(s1.params["embed"]), np.asarray(params["embed"])
    )
    s2, _ = step(s1, frozen, batch, 1e-2, 0.0, key)
    # micro-step 2: real update; EMA ticks exactly once with decay d
    expect = jax.tree.map(lambda p0, p2: d * p0 + (1 - d) * p2, params, s2.params)
    np.testing.assert_allclose(
        np.asarray(s2.ema_params["embed"]), np.asarray(expect["embed"]), atol=1e-6
    )


def test_ema_gate_survives_nonfinite_skip_under_accumulation():
    """A skipped non-finite micro-step reverts MultiSteps' mini_step while
    state.step still increments, so a (state.step+1)%k EMA gate stays
    permanently desynchronized: it ticks on no-update micro-steps and
    misses every real optimizer update afterwards. The gate must read
    mini_step from the post-revert opt_state instead (review fix)."""
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs", "ball"])
    d, k = 0.5, 2
    cfg = Config(
        embed_size=16, hidden_size=24, max_decode_len=6,
        ema_decay=d, grad_accum_steps=k, skip_nonfinite=True,
    )
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, L, T = 4, 5, 6
    caps, lens = vocab.encode_batch([["a", "dog", "runs", "ball"]] * B, T)
    feats = rng.standard_normal((B, L, 512))
    batch = {
        "features": jnp.asarray(feats, jnp.float32),
        "captions": jnp.asarray(caps),
        "lengths": jnp.asarray(lens),
    }
    nan_batch = dict(batch, features=jnp.full((B, L, 512), jnp.nan, jnp.float32))
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    key = jax.random.PRNGKey(1)

    # NaN micro-step: everything reverts (params, mini_step, EMA), but
    # state.step still advances — this is what desyncs a step-parity gate.
    s1, m1 = step(state, frozen, nan_batch, 1e-2, 0.0, key)
    assert not np.isfinite(np.asarray(m1["grad_norm"]))
    np.testing.assert_array_equal(
        np.asarray(s1.params["embed"]), np.asarray(params["embed"])
    )
    np.testing.assert_array_equal(
        np.asarray(s1.ema_params["embed"]), np.asarray(params["embed"])
    )
    assert int(s1.step) == 1

    # finite micro-step 1 of 2: accumulate only — no param change, no tick
    # (the old gate ticked HERE, because (1+1)%2 == 0)
    s2, _ = step(s1, frozen, batch, 1e-2, 0.0, key)
    np.testing.assert_array_equal(
        np.asarray(s2.params["embed"]), np.asarray(params["embed"])
    )
    np.testing.assert_array_equal(
        np.asarray(s2.ema_params["embed"]), np.asarray(params["embed"])
    )

    # finite micro-step 2 of 2: the inner optimizer applies; the EMA must
    # tick exactly once with decay d (the old gate missed it: (2+1)%2 == 1)
    s3, _ = step(s2, frozen, batch, 1e-2, 0.0, key)
    assert not np.array_equal(
        np.asarray(s3.params["embed"]), np.asarray(params["embed"])
    )
    expect = jax.tree.map(lambda p0, p3: d * p0 + (1 - d) * p3, params, s3.params)
    np.testing.assert_allclose(
        np.asarray(s3.ema_params["embed"]), np.asarray(expect["embed"]), atol=1e-6
    )
