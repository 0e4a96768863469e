"""Training runtime — the reference ``Trainer`` (train.py:20-197) rebuilt SPMD.

Epoch/iteration semantics preserved:
- epochs run 1..max_epochs (train.py:97); resume skips completed
  epochs/iterations from the saved infos (train.py:70-85,98-99,119-120),
- per-epoch LR step decay + scheduled-sampling schedule (train.py:101-113 /
  schedule.py; sampling actually implemented here),
- loss/perplexity logged every ``log_step`` (train.py:151-154),
- every ``save_checkpoint_every`` total iterations: validation, histories,
  best-checkpoint gate on CIDEr (language_eval==1) or −val_loss
  (train.py:156-196).

What's different (TPU-native):
- the step is one jitted SPMD program over the mesh (parallel/mesh.py)
  instead of ``nn.DataParallel`` scatter/gather,
- pretrained-weight loading is real (the reference's ``load_model``/
  ``load_optimizer`` are empty stubs, train.py:60-64),
- step time and throughput are measured *and reported* (the reference
  times steps and discards the numbers, train.py:123-124,148-149).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.obs.meters import StepTimer, ThroughputMeter
from show_and_tell_tpu.obs.profiler import profile_trace
from show_and_tell_tpu.parallel import mesh as mesh_lib
from show_and_tell_tpu.train.schedule import lr_for_epoch, ss_prob_for_epoch
from show_and_tell_tpu.train.step import make_train_state, make_train_step
from show_and_tell_tpu.utils.rng import KeyChain

log = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        model,
        trainloader: Iterable,
        validloader: Optional[Iterable] = None,
        eval_fn: Optional[Callable] = None,
        mesh=None,
    ):
        """``eval_fn(params, batch_stats, frozen) -> (val_loss, predictions,
        lang_stats)`` — injected by the eval driver (evalsuite.driver);
        ``lang_stats`` must contain 'CIDEr' when cfg.language_eval == 1."""
        self.cfg = cfg
        self.model = model
        self.trainloader = trainloader
        self.validloader = validloader
        self.eval_fn = eval_fn
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            cfg.num_devices, cfg.model_parallel
        )
        self.keys = KeyChain(cfg.random_seed)
        if cfg.use_pallas is not None:
            from show_and_tell_tpu.ops.lstm import set_pallas_enabled

            set_pallas_enabled(cfg.use_pallas)

        params, frozen = model.init(self.keys.key("init"))
        if cfg.encoder_weights:
            # pretrained backbone from a torchvision state_dict checkpoint
            from show_and_tell_tpu.models.encoders import load_torch_encoder

            frozen = load_torch_encoder(model.encoder_name, cfg.encoder_weights)
            log.info("loaded %s weights from %s", model.encoder_name, cfg.encoder_weights)
        batch_stats = (
            model.init_batch_stats() if hasattr(model, "init_batch_stats") else None
        )

        # Pretrained-weight resume (config.py:33-36 surface; real here).
        if cfg.load_pretrained and cfg.load_model_path:
            restored = ckpt.load_best_params(cfg.load_model_path, params, batch_stats)
            if restored is not None:
                params, batch_stats = restored
                log.info("loaded pretrained params from %s", cfg.load_model_path)

        if getattr(cfg, "torch_checkpoint", None):
            # fine-tune migration: start training from a reference-trained
            # model-best.pth (the same overlay serving/eval use — review
            # fix: the flag was silently ignored here and a "fine-tune" run
            # trained from random weights)
            from show_and_tell_tpu.ckpt.torch_import import (
                apply_reference_checkpoint,
            )

            params, batch_stats, frozen, has_enc = apply_reference_checkpoint(
                cfg, params, batch_stats, frozen
            )
            if not has_enc and not cfg.encoder_weights:
                log.warning(
                    "torch_checkpoint %s carries no encoder weights and "
                    "encoder_weights is unset: fine-tuning on top of a "
                    "randomly initialized frozen encoder",
                    cfg.torch_checkpoint,
                )
            log.info(
                "initialized trainable params from reference checkpoint %s",
                cfg.torch_checkpoint,
            )

        params = mesh_lib.place_params(self.mesh, params)
        self.frozen = mesh_lib.replicate(self.mesh, frozen)
        self.state = make_train_state(cfg, params, batch_stats)
        self.train_step = make_train_step(model, cfg, donate=cfg.donate)
        self.timer = StepTimer()
        self.throughput = ThroughputMeter()

    # ------------------------------------------------------------------

    def eval_params(self):
        """The weights evaluation and best-checkpointing use: the Polyak/EMA
        average when ``cfg.ema_decay > 0`` (the averaged model is the one a
        user deploys), else the live params."""
        if getattr(self.state, "ema_params", None) is not None:
            return self.state.ema_params
        return self.state.params

    def _maybe_quantize_backbone(self, batch) -> None:
        """int8 PTQ of the FROZEN trunk for training too (it is behind
        stop_gradient either way — models/quantize.py): calibrate on the
        first batch, then every train step, periodic eval, and checkpointed
        serving all run the same int8 features. No-op unless
        ``cfg.quantize_backbone`` and the encoder has an int8 recipe
        (``quantize.QUANTIZABLE_ENCODERS``: VGG16, ResNet-152,
        Inception-v3)."""
        cfg = self.cfg
        from show_and_tell_tpu.models import quantize as quantize_mod

        if (
            not getattr(cfg, "quantize_backbone", False)
            or self.model.encoder_name not in quantize_mod.QUANTIZABLE_ENCODERS
            or "images" not in batch
            or quantize_mod.is_quantized(self.frozen)
        ):
            return
        import jax.numpy as jnp

        from show_and_tell_tpu.data.transforms import eval_transform

        calib = eval_transform(
            jnp.asarray(np.asarray(batch["images"])[:32]), cfg.crop_size
        )
        self.frozen = mesh_lib.replicate(
            self.mesh,
            quantize_mod.obtain_quantized(
                self.model.encoder_name, self.frozen, calib,
                path=getattr(cfg, "quantized_backbone_path", None),
            ),
        )
        log.info("frozen backbone quantized to int8 (calibrated on %d images)",
                 min(32, len(batch["images"])))

    _DEVICE_KEYS = ("captions", "lengths", "features", "images")

    def _shard(self, batch):
        # Only array fields go to device; metadata (imgids/cocoids/paths)
        # stays host-side. Under multi-host each process contributes its
        # local shard to the global data-sharded array
        # (distributed.globalize_batch == shard_batch on one process).
        device_batch = {k: batch[k] for k in self._DEVICE_KEYS if k in batch}
        from show_and_tell_tpu.parallel import distributed

        return distributed.globalize_batch(self.mesh, device_batch)

    def train(self, preempt_guard=None) -> dict:
        """Run the training loop. ``preempt_guard``: an externally managed
        :class:`~show_and_tell_tpu.train.preempt.PreemptionGuard` (tests /
        cluster-notice watchers); by default one is installed here for
        SIGTERM/SIGINT when ``cfg.preempt_save`` (trigger -> finish the
        in-flight step, save full train state + infos, return)."""
        import contextlib

        from show_and_tell_tpu.train.preempt import PreemptionGuard, RssWatchdog

        with contextlib.ExitStack() as stack:
            guard = preempt_guard
            if guard is None and self.cfg.preempt_save:
                guard = stack.enter_context(PreemptionGuard())
            if getattr(self.cfg, "rss_preempt_gb", 0) > 0:
                # memory-leak containment: past the threshold, the watchdog
                # triggers the same clean save the SIGTERM path uses — the
                # epoch-chain supervisor then respawns (train/preempt.py).
                # With preempt_save=false there is still a programmatic
                # latch (no signal hooks) so the knob is never silently
                # inert (review fix).
                if guard is None:
                    guard = PreemptionGuard()  # trigger()-only, not entered
                stack.enter_context(
                    RssWatchdog(guard, self.cfg.rss_preempt_gb)
                )
            return self._train_loop(guard)

    def _train_loop(self, guard) -> dict:
        cfg = self.cfg
        infos = {}
        stale_preempt_flag = False
        if cfg.start_from is not None and not cfg.load_pretrained:
            loaded = ckpt.load_infos(cfg.start_from)
            if loaded:
                infos = loaded
                # consumed by this resume — but the flag is only cleared ON
                # DISK at the next persist; track it so a resume that runs
                # zero new steps (preemption landed on an epoch's final
                # iteration) still rewrites infos, or the epoch-chain
                # supervisor would see a stale preempted=True forever and
                # abort a finished epoch as 'no progress' (review fix)
                stale_preempt_flag = infos.pop("preempted", None) is not None
                # Prefer the full train state (params + Adam moments + step,
                # bit-continuous resume); fall back to best-params only.
                # Either way the restored host arrays must be re-placed on
                # the mesh — from_bytes drops the TP sharding __init__
                # established (review fix; see step.place_train_state).
                from show_and_tell_tpu.train.step import place_train_state

                full = ckpt.load_train_state(cfg.start_from, self.state)
                if full is not None:
                    self.state = place_train_state(self.mesh, cfg, full)
                else:
                    restored = ckpt.load_best_params(
                        cfg.start_from, self.state.params, self.state.batch_stats
                    )
                    if restored is not None:
                        import jax.numpy as jnp

                        self.state = place_train_state(
                            self.mesh,
                            cfg,
                            self.state.replace(
                                params=restored[0],
                                batch_stats=restored[1],
                                # re-seed the EMA from the RESTORED weights
                                # (review fix: it otherwise kept the random
                                # __init__ copy and blended garbage into
                                # ~1/(1-d) evals)
                                ema_params=(
                                    jax.tree.map(jnp.copy, restored[0])
                                    if self.state.ema_params is not None
                                    else None
                                ),
                            ),
                        )
                log.info("resuming from %s", cfg.start_from)

        total_iteration = infos.get("total_iter", 0)
        loaded_iteration = infos.get("iter", 0)
        loaded_epoch = infos.get("epoch", 1)
        # identity of the restored position, for the zero-new-steps persist
        resumed_at = (loaded_epoch, loaded_iteration, total_iteration)
        val_result_history = infos.get("val_result_history", {})
        loss_history = infos.get("loss_history", {})
        lr_history = infos.get("lr_history", {})
        best_val_score = infos.get("best_val_score") if cfg.load_best_score else None

        # per-epoch schedule record (the learning-curve artifact needs the
        # lr/ss values actually applied each epoch, not just the per-gate
        # lr_history the reference keeps, train.py:163-166)
        epoch_schedule = infos.get("epoch_schedule", {})
        # (epoch, it, total_iteration) of work done since the last persist —
        # a clean loop completion must save it, or an epoch-chain link whose
        # final iterations fell between checkpoint gates would hand off a
        # stale (possibly still preempted-flagged) infos blob and the next
        # link would replay-and-retrain the tail
        unpersisted = None

        for epoch in range(1, 1 + cfg.max_epochs):
            if epoch < loaded_epoch:
                continue
            lr = lr_for_epoch(cfg, epoch)
            ss_prob = ss_prob_for_epoch(cfg, epoch)
            self.cfg = cfg = cfg.replace(current_lr=lr, ss_prob=ss_prob)
            epoch_schedule[str(epoch)] = {"lr": lr, "ss_prob": ss_prob}
            infos["epoch_schedule"] = epoch_schedule
            if hasattr(self.trainloader, "set_epoch"):
                self.trainloader.set_epoch(epoch)  # resume-deterministic order

            # Resume replay: skip already-trained iterations BEFORE any
            # decode/transfer work. Loaders exposing set_resume_skip drop the
            # batch plans outright (no host decode); otherwise raw batches
            # are consumed and discarded without the device transfer.
            skip_n = loaded_iteration if epoch == loaded_epoch else 0
            raw_skip = 0
            if skip_n and hasattr(self.trainloader, "set_resume_skip"):
                self.trainloader.set_resume_skip(skip_n)
            else:
                raw_skip = skip_n

            # One-batch transfer lookahead: batch i+1 is placed on device
            # (async) while step i computes, hiding host->device copies.
            def _sharded_batches(discard: int):
                it_ = iter(self.trainloader)
                for _ in range(discard):
                    try:
                        next(it_)
                    except StopIteration:
                        return
                try:
                    nxt = next(it_)
                except StopIteration:
                    return
                nxt_dev = self._shard(nxt)
                for following in it_:
                    fol_dev = self._shard(following)
                    yield nxt, nxt_dev
                    nxt, nxt_dev = following, fol_dev
                yield nxt, nxt_dev

            # Device sync happens once per log window (not per step), so
            # host dispatch for step i+1 overlaps device compute of step i;
            # per-step time is the window average. The fetch itself is lazy
            # by one window: at step N we log step N-log_step's loss (already
            # complete on device — the float() returns immediately) instead
            # of blocking ~one host round-trip on step N's result.
            window_t0 = time.perf_counter()
            window_items = window_steps = 0
            pending_log = None  # (epoch, it, metrics) awaiting its log line
            for off, (batch, dev_batch) in enumerate(_sharded_batches(raw_skip)):
                it = off + 1 + skip_n
                total_iteration += 1
                unpersisted = (epoch, it, total_iteration)
                self._maybe_quantize_backbone(batch)

                rng = self.keys.key("train", epoch, it)
                with profile_trace(
                    cfg.profile_dir or "/tmp/sat_trace",
                    enabled=(cfg.profile_step == total_iteration and cfg.profile_dir is not None),
                ):
                    self.state, metrics = self.train_step(
                        self.state, self.frozen, dev_batch, lr, ss_prob, rng
                    )
                window_items += int(np.asarray(batch["captions"]).shape[0])
                window_steps += 1

                if it % cfg.log_step == 0:
                    # flush the lagged line BEFORE folding in this window's
                    # timing, so step N's log line reports the meters as of
                    # window N (not N+1's). The float() inside also bounds
                    # in-flight dispatch to ~2 log windows — configs with
                    # very large log_step x batch hold that many input
                    # buffers on device.
                    if pending_log is not None:
                        self._log_step_line(*pending_log)
                    dt = time.perf_counter() - window_t0
                    self.timer.record(dt / window_steps)
                    self.throughput.update(window_items, dt)
                    window_t0 = time.perf_counter()
                    window_items = window_steps = 0
                    pending_log = (epoch, it, metrics)

                if total_iteration % cfg.save_checkpoint_every == 0:
                    best_val_score = self._checkpoint(
                        epoch,
                        it,
                        total_iteration,
                        float(metrics["loss"]),
                        lr,
                        best_val_score,
                        val_result_history,
                        loss_history,
                        lr_history,
                        infos,
                    )
                    unpersisted = None
                    stale_preempt_flag = False  # persist rewrote infos
                    # eval + checkpoint I/O must not pollute the timing window
                    window_t0 = time.perf_counter()
                    window_items = window_steps = 0

                if guard is not None and guard.triggered:
                    if pending_log is not None:
                        self._log_step_line(*pending_log)
                    self._emergency_save(
                        epoch, it, total_iteration, float(metrics["loss"]),
                        lr, best_val_score, val_result_history,
                        loss_history, lr_history, infos,
                    )
                    return infos
            if pending_log is not None:  # flush the lagged window at epoch end
                self._log_step_line(*pending_log)
                pending_log = None
            loaded_iteration = 0  # after the resume epoch, run all iterations

        if unpersisted is not None or stale_preempt_flag:
            # end-of-run save of work that fell after the last checkpoint
            # gate (no validation here — this is the resume/handoff
            # artifact, the same schema the gate persists). Also taken when
            # ZERO new steps ran but the resume consumed a preempted flag:
            # the rewrite clears it on disk (review fix — see the resume
            # block above).
            at = unpersisted if unpersisted is not None else resumed_at
            self._persist_state(
                *at, best_val_score,
                val_result_history, loss_history, lr_history, infos,
            )
            log.info(
                "end-of-run train state saved at epoch %d iter %d (total %d)",
                *at,
            )
        return infos

    def _log_step_line(self, epoch, it, metrics) -> None:
        loss = float(metrics["loss"])
        log.info(
            "Epoch [%d/%d], Step [%d], Loss: %.4f, Perplexity: %5.4f, "
            "%.1f img/s, %.0f ms/step",
            epoch,
            self.cfg.max_epochs,
            it,
            loss,
            float(np.exp(loss)),
            self.throughput.items_per_sec,
            1000 * (self.timer.avg_s or 0),
        )

    # ------------------------------------------------------------------

    def _emergency_save(
        self,
        epoch,
        it,
        total_iteration,
        train_loss,
        lr,
        best_val_score,
        val_result_history,
        loss_history,
        lr_history,
        infos,
    ) -> None:
        """Preemption checkpoint: the same resume artifacts as the periodic
        path (full train state + infos) but WITHOUT the validation eval —
        the SIGTERM->SIGKILL grace window is short. ``model-best`` is left
        untouched (no score was computed to gate it)."""
        self._persist_state(
            epoch, it, total_iteration, best_val_score,
            val_result_history, loss_history, lr_history, infos,
            preempted=True,
        )
        log.warning(
            "preempted at epoch %d iter %d (total %d, loss %.4f): full "
            "train state saved to %s — resume with start_from",
            epoch, it, total_iteration, train_loss, self.cfg.expr_dir,
        )

    def _persist_state(
        self,
        epoch,
        it,
        total_iteration,
        best_val_score,
        val_result_history,
        loss_history,
        lr_history,
        infos,
        preempted: bool = False,
    ) -> None:
        """The ONE definition of the resume-artifact schema (infos blob +
        full train state), shared by the periodic checkpoint and the
        preemption save — two copies of this block let the schemas drift
        (review fix)."""
        if jax.process_index() != 0:
            return  # multi-host: one writer, or processes clobber each other
        cfg = self.cfg
        infos.update(
            total_iter=total_iteration,
            iter=it,
            epoch=epoch,
            best_val_score=best_val_score,
            opt=cfg.to_dict(),
            val_result_history=val_result_history,
            loss_history=loss_history,
            lr_history=lr_history,
        )
        if preempted:
            infos["preempted"] = True
        ckpt.save_infos(cfg.expr_dir, infos)
        ckpt.save_train_state(cfg.expr_dir, self.state)

    def _checkpoint(
        self,
        epoch,
        it,
        total_iteration,
        train_loss,
        lr,
        best_val_score,
        val_result_history,
        loss_history,
        lr_history,
        infos,
    ):
        cfg = self.cfg
        val_loss, predictions, lang_stats = None, [], {}
        if self.eval_fn is not None:
            val_loss, predictions, lang_stats = self.eval_fn(
                self.eval_params(), self.state.batch_stats, self.frozen
            )
        val_result_history[str(total_iteration)] = {
            "loss": val_loss,
            "lang_stats": lang_stats,
            # the reference stores every prediction in infos (train.py:161);
            # a bounded sample keeps the JSON blob reasonable
            "predictions_sample": predictions[:10],
        }
        loss_history[str(total_iteration)] = train_loss
        lr_history[str(total_iteration)] = lr

        if cfg.language_eval == 1 and lang_stats:
            current_score = lang_stats.get("CIDEr")
        elif val_loss is not None:
            current_score = -val_loss
        else:
            current_score = -train_loss

        best_flag = best_val_score is None or (
            current_score is not None and current_score > best_val_score
        )
        if best_flag:
            best_val_score = current_score

        self._persist_state(
            epoch, it, total_iteration, best_val_score,
            val_result_history, loss_history, lr_history, infos,
        )
        if best_flag and jax.process_index() == 0:
            ckpt.save_best(
                cfg.expr_dir,
                jax.device_get(self.eval_params()),
                jax.device_get(self.state.batch_stats),
                infos,
            )
            log.info("model saved to %s (score %.4f)", cfg.expr_dir, current_score or 0)
        return best_val_score
