"""The jitted SPMD training step.

Optimizer semantics mirror the reference exactly:
- per-element gradient clamp to ±grad_clip *before* Adam (train.py:88-91
  ``param.grad.data.clamp_``; optax.clip is the same element-wise clamp),
- Adam over trainable params only (train.py:55-56 filters requires_grad;
  here frozen backbone params simply live outside the optimized tree),
- learning rate passed per step so the host-side epoch schedule
  (schedule.lr_for_epoch) sets it, like the reference's ``set_lr``.

TPU design: one ``jax.jit``-compiled function; the batch arrives sharded over
the mesh ``data`` axis, params replicated (or TP-sharded on ``model``), and
XLA inserts the gradient psum over ICI — no hand-written collectives. Buffers
are donated so parameters update in place in HBM.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.transforms import eval_transform, train_transform
from show_and_tell_tpu.train.losses import masked_cross_entropy


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any  # ShowTell encoder BN running stats (None for SAT)
    step: jax.Array  # int32 scalar
    # Polyak/EMA average of params (cfg.ema_decay > 0), else None. Lives in
    # the train state so resume carries it bit-continuously like the Adam
    # moments.
    ema_params: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # clip -> adam; lr applied at update time via the scale-by-lr trick so the
    # host schedule can change it without re-jitting.
    tx = optax.chain(
        optax.clip(cfg.grad_clip),
        optax.scale_by_adam(),
        optax.scale(-1.0),
    )
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # Gradient accumulation: average grads over k microbatches on
        # device, apply one Adam update every k-th step — k x the effective
        # batch at the same peak memory. Clip/Adam see the AVERAGED
        # gradient, so k microbatches of B/k match one batch of B up to fp
        # reduction order (pinned in tests/test_train.py). The reference
        # has no analogue.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def make_train_state(cfg: Config, params: Any, batch_stats: Any = None) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        step=jnp.zeros((), jnp.int32),
        # seeded with a COPY of the initial params so the average is
        # well-defined from step 1 (jnp.copy, not asarray: aliased buffers
        # would be donated twice by the jitted step and crash Execute())
        ema_params=(
            jax.tree.map(jnp.copy, params)
            if getattr(cfg, "ema_decay", 0.0) > 0
            else None
        ),
    )


def place_train_state(mesh, cfg: Config, state: TrainState) -> TrainState:
    """Re-apply mesh placement to a train state restored from bytes.

    ``serialization.from_bytes`` yields host numpy leaves, so a resumed
    state silently loses the TP sharding ``__init__`` established (review
    fix: with model_parallel > 1 the vocab-sharded embedding/head and
    their Adam moments came back replicated, multiplying per-device HBM
    by the model-axis size). Param shardings come from
    ``mesh_lib.place_params``; the Adam-moment leaves mirror the param
    tree, so a throwaway ``tx.init`` on the placed params yields the
    matching sharding template for each moment leaf.
    """
    from show_and_tell_tpu.parallel import mesh as mesh_lib

    if mesh_lib._single_device(mesh):
        # plain uncommitted placement: committed single-device sharding
        # costs ~45x dispatch overhead on the relay backend (mesh.py note)
        return jax.tree.map(jax.device_put, state)
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = mesh_lib.place_params(mesh, state.params)
    template = make_optimizer(cfg).init(params)
    replicated = NamedSharding(mesh, P())

    def put_like(val, tmpl):
        sh = tmpl.sharding
        # eager zeros_like in tx.init propagates the param's NamedSharding
        # to the moment leaves; scalar leaves (Adam count) are created
        # fresh on one device — those replicate over the mesh
        if not isinstance(sh, NamedSharding):
            sh = replicated
        return jax.device_put(val, sh)

    opt_state = jax.tree.map(put_like, state.opt_state, template)
    batch_stats = (
        mesh_lib.replicate(mesh, state.batch_stats)
        if state.batch_stats is not None
        else None
    )
    return TrainState(
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        step=jax.device_put(state.step, replicated),
        ema_params=(
            mesh_lib.place_params(mesh, state.ema_params)
            if state.ema_params is not None
            else None
        ),
    )


def make_train_step(
    model,
    cfg: Config,
    donate: bool = True,
) -> Callable:
    """Builds ``step(state, frozen, batch, lr, ss_prob, rng) -> (state, metrics)``.

    ``batch`` needs ``captions`` [B,T] int32 and ``lengths`` [B] int32, plus
    either precomputed ``features`` or raw ``images`` (run through the frozen
    backbone inside the step, on device).
    """
    tx = make_optimizer(cfg)
    is_sat = type(model).__name__ == "ShowAttendTellModel"
    # With the schedule disabled (the default, and the reference's actual
    # behavior) pass a STATIC 0.0 so decode_train takes its batched-head
    # teacher-forcing path; the traced ss_prob argument still exists in the
    # step signature but is ignored.
    ss_enabled = cfg.scheduled_sampling_start >= 0

    def loss_fn(params, batch_stats, features, captions, lengths, ss_prob, rng_ss):
        if not ss_enabled:
            ss_prob = 0.0
        if is_sat:
            logits, mask, _ = model.decode_train(
                params, features, captions, lengths, rng_ss, ss_prob
            )
            new_stats = batch_stats
        else:
            feat_embed, new_stats = model.encode(
                params, batch_stats, features, train=True
            )
            logits, mask = model.decode_train(
                params, feat_embed, captions, lengths, rng_ss, ss_prob
            )
        loss, count = masked_cross_entropy(logits, captions[:, 1:], mask)
        return loss, (new_stats, count)

    def step(state: TrainState, frozen, batch, lr, ss_prob, rng):
        captions, lengths = batch["captions"], batch["lengths"]
        rng_aug, rng_ss = jax.random.split(rng)
        # The frozen backbone runs OUTSIDE the differentiated function: with
        # it inside, JAX linearizes the whole conv stack and XLA fails to
        # fully DCE the unused residuals even behind stop_gradient —
        # measured ~8x slower full steps on Inception-v3.
        if "features" in batch:
            features = batch["features"]
        else:
            images = batch["images"]
            if images.dtype == jnp.uint8:
                # on-device RandomCrop+HFlip+Normalize (main.py:26-30),
                # fused into the step
                images = train_transform(rng_aug, images, cfg.crop_size)
            features = model.backbone_features(frozen, images)
        (loss, (new_stats, count)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, features, captions, lengths, ss_prob, rng_ss)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(state.params, updates)
        finite = jnp.isfinite(grad_norm)
        if cfg.skip_nonfinite:
            # Failure detection (absent from the reference, SURVEY.md §5):
            # a non-finite gradient anywhere drops this step's update —
            # params, optimizer state, AND batch stats are carried forward
            # unchanged (a NaN batch would otherwise permanently poison the
            # ShowTell encoder's BN running stats through the EMA).
            params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                opt_state,
                state.opt_state,
            )
            if new_stats is not None:
                new_stats = jax.tree.map(
                    lambda new, old: jnp.where(finite, new, old),
                    new_stats,
                    state.batch_stats,
                )
        ema_params = state.ema_params
        if state.ema_params is not None and getattr(cfg, "ema_decay", 0.0) > 0:
            d = cfg.ema_decay
            # one EMA tick per REAL optimizer update: under gradient
            # accumulation MultiSteps only applies every k-th micro-step,
            # and ticking each micro-step would compound the decay to d^k
            # (review fix). The gate reads MultiSteps' OWN mini_step from
            # the (post-revert) opt_state — mini_step wraps to 0 exactly
            # when the inner optimizer applied — because a skipped
            # non-finite micro-step reverts mini_step while state.step
            # still increments, and a (state.step+1)%k gate would stay
            # permanently desynchronized after the first skip (review
            # fix, empirically reproduced: the EMA stopped tracking real
            # updates forever).
            k = getattr(cfg, "grad_accum_steps", 1)
            applied = (
                opt_state.mini_step == 0 if k > 1 else True
            )
            moved = jnp.logical_and(
                finite if cfg.skip_nonfinite else True,
                applied,
            )
            ema_params = jax.tree.map(
                lambda e, p: jnp.where(moved, e * d + p * (1.0 - d), e),
                state.ema_params,
                params,
            )
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            batch_stats=new_stats,
            step=state.step + 1,
            ema_params=ema_params,
        )
        metrics = {
            "loss": loss,
            "perplexity": jnp.exp(loss),
            "tokens": count,
            "grad_norm": grad_norm,
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(model, cfg: Config) -> Callable:
    """Teacher-forced validation loss (eval.py:91-95).

    NOTE: the reference evaluates with full ``lengths`` while training uses
    ``lengths - 1`` (eval.py:91 vs train.py:134-135) — a latent inconsistency.
    We use the training convention (mask t < len-1) in both, documented as an
    intended-behavior fix (SURVEY.md §7 hard-part #6).
    """
    is_sat = type(model).__name__ == "ShowAttendTellModel"

    def step(params, batch_stats, frozen, batch):
        captions, lengths = batch["captions"], batch["lengths"]
        if "features" in batch:
            features = batch["features"]
        else:
            images = batch["images"]
            if images.dtype == jnp.uint8:
                images = eval_transform(images, cfg.crop_size)
            features = model.backbone_features(frozen, images)
        if is_sat:
            logits, mask, _ = model.decode_train(params, features, captions, lengths)
        else:
            feat_embed, _ = model.encode(params, batch_stats, features, train=False)
            logits, mask = model.decode_train(params, feat_embed, captions, lengths)
        loss, count = masked_cross_entropy(logits, captions[:, 1:], mask)
        return loss, count

    return jax.jit(step)
