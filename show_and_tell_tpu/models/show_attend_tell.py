"""Show-Attend-and-Tell: VGG16 feature grid + additive soft attention + LSTM.

The flagship model — the one the reference actually trains (train.py:37
constructs ``ShowAttendTellModel`` from model2.py). Capability parity map:

- Encoder: frozen VGG16 trunk to conv5_2+ReLU -> [B, 196, 512] patch grid
  (model2.py:15-16,43-44; frozen via model2.py:87-89 -> ``stop_gradient``).
- ``ctx_enc = features @ image_att_w`` precomputed once per image
  (model2.py:45).
- LSTM state init from the mean feature through two Linears
  (model2.py:21-22,67-71).
- Per step: additive attention (model2.py:73-78, incl. the faithful *mean*
  pooling quirk), LSTMCell over [emb; context] (model2.py:58-59), output head
  ``classifier(c2o(context) + h2o(h))`` (model2.py:80-85). The reference's
  Dropout(p=0.5) is declared but never applied in forward (model2.py:33) —
  we expose ``dropout_rate`` defaulting to 0 to match actual behavior.
- Scheduled sampling implemented per the config knobs (config.py:50-57);
  the reference defines but comments out the schedule (train.py:109-113).

Intended-behavior fixes (documented deviations, SURVEY.md §7 "hard parts" #6):
- Greedy decode feeds each step the *fresh* attention context; the reference
  reuses the previous step's context in the LSTM input (model2.py:102-109
  computes ``rnn_input`` one iteration late).
- Decode starts from ``<start>`` (=id 1; the reference's ``torch.ones`` start
  hack, model2.py:93, lands on the same id).

TPU design: full-batch masked ``lax.scan`` over time replaces the reference's
per-step batch truncation over ``pack_padded_sequence.batch_sizes``
(model2.py:54-62) — static shapes for XLA; padding-step waste is reclaimed by
length-bucketing in the data pipeline. The LSTM cell dispatches through
ops/lstm.py (XLA-fused by default; Pallas kernel opt-in, see its STATUS).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models import encoders
from show_and_tell_tpu.models.layers import (
    cast_tree,
    dense,
    dropout,
    embedding_lookup,
    uniform_dense,
)
from show_and_tell_tpu.ops.attention import (
    additive_attention,
    additive_attention_beamed,
    encode_features,
    init_attention_params,
)
from show_and_tell_tpu.ops.lstm import init_lstm_params, lstm_cell

Params = Dict


class ShowAttendTellModel:
    def __init__(self, cfg: Config, vocab_size: int, dropout_rate: float = 0.0):
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.dropout_rate = dropout_rate
        self.encoder_name = "vgg16"
        self.feature_dim = 512  # VGG conv5 channels
        self.num_patches = (cfg.crop_size // 16) ** 2  # 196 for 224 input
        # Compute dtype: bf16 matmuls (MXU native) with fp32 params, fp32 LSTM
        # cell state and fp32 softmax/log-softmax — the standard TPU mixed-
        # precision recipe. Params live fp32 in the optimizer; casts happen
        # inside the differentiated function.
        self.cdtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    # --- init -------------------------------------------------------------

    def init(self, key: jax.Array) -> Tuple[Params, Params]:
        cfg = self.cfg
        D, H, E, V = self.feature_dim, cfg.hidden_size, cfg.embed_size, self.vocab_size
        ks = jax.random.split(key, 8)
        trainable = {
            "att": init_attention_params(ks[0], D, H, D),
            "init_h": uniform_dense(ks[1], D, H),
            "init_c": uniform_dense(ks[2], D, H),
            "embed": jax.random.uniform(ks[3], (V, E), jnp.float32, -0.1, 0.1),
            # LSTMCell input is [emb; context] = E + D (model2.py:28,58)
            "lstm": init_lstm_params(ks[4], E + D, H),
            "c2o": uniform_dense(ks[5], D, E),
            "h2o": uniform_dense(ks[6], H, E),
            "classifier": uniform_dense(ks[7], E, V),
        }
        frozen = encoders.init_encoder("vgg16", jax.random.fold_in(key, 99))
        return trainable, frozen

    # --- encoder ----------------------------------------------------------

    def backbone_features(self, frozen: Params, images: jax.Array) -> jax.Array:
        """[B, 224, 224, 3] -> [B, 196, 512], gradient-stopped.

        The trunk runs in the compute dtype end to end (conv weights are cast
        per-op by layers.conv2d); bf16 doubles MXU throughput and halves the
        HBM weight traffic of the frozen VGG. A quantized tree (int8 PTQ,
        models/quantize.py — Config.quantize_backbone serving path)
        dispatches to the int8 trunk."""
        from show_and_tell_tpu.models.quantize import backbone_features_q, is_quantized

        if is_quantized(frozen):
            return backbone_features_q(frozen, images)
        images = images.astype(self.cdtype)
        return jax.lax.stop_gradient(encoders.vgg16_features(frozen, images))

    def init_lstm_state(self, trainable: Params, features: jax.Array):
        """Mean feature through two Linears (model2.py:67-71)."""
        mean = jnp.mean(features, axis=1)
        return dense(trainable["init_h"], mean), dense(trainable["init_c"], mean)

    # --- one decoder step -------------------------------------------------

    def _step(self, trainable, features, ctx_enc, h, c, emb, rng=None):
        """One decode step. ``trainable``/``features``/``ctx_enc``/``emb``
        arrive pre-cast to the compute dtype; ``h`` is compute-dtype, ``c``
        stays fp32 (mixed-precision recurrence)."""
        context, alpha = additive_attention(trainable["att"], features, ctx_enc, h)
        rnn_in = jnp.concatenate([emb, context], axis=-1)
        h, c = lstm_cell(trainable["lstm"], rnn_in, h, c)
        out = dense(trainable["c2o"], context) + dense(trainable["h2o"], h)
        out = dropout(rng, out, self.dropout_rate)
        logits = dense(trainable["classifier"], out)
        return h, c, logits, alpha

    def _cast_for_compute(self, trainable, features):
        """Cast params + per-image tensors to the compute dtype once per
        call (outside the time loop); keep the LSTM bias fp32 (it adds into
        the fp32 gate accumulator)."""
        cd = self.cdtype
        t = dict(trainable)
        for k in ("att", "embed", "c2o", "h2o", "classifier"):
            t[k] = cast_tree(trainable[k], cd)
        t["lstm"] = {"w": trainable["lstm"]["w"].astype(cd), "b": trainable["lstm"]["b"]}
        features = features.astype(cd)
        return t, features

    # --- training forward -------------------------------------------------

    def decode_train(
        self,
        trainable: Params,
        features: jax.Array,  # [B, 196, 512]
        captions: jax.Array,  # [B, T] int32
        lengths: jax.Array,  # [B]
        rng: Optional[jax.Array] = None,
        ss_prob: float | jax.Array = 0.0,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Teacher-forced (optionally scheduled-sampled) logits.

        Step t consumes token ``captions[:, t]`` and is scored against
        ``captions[:, t+1]`` (model2.py:54-62 alignment); mask ``t < len-1``.
        Returns ``(logits [B, T-1, V], mask [B, T-1], alphas [B, T-1, L])``.
        """
        B, T = captions.shape
        trainable, features = self._cast_for_compute(trainable, features)
        ctx_enc = encode_features(trainable["att"], features)
        h, c = self.init_lstm_state(trainable, features)
        c = c.astype(jnp.float32)  # cell state accumulates in fp32
        tokens = jnp.swapaxes(captions[:, :-1], 0, 1)  # [T-1, B]
        if rng is None:
            rng = jax.random.PRNGKey(0)

        # Pure teacher forcing (the reference's actual behavior — its
        # scheduled-sampling schedule is commented out, train.py:109-113) is
        # detected STATICALLY (Python-float 0.0, not a traced scalar) and
        # takes a faster formulation: only the recurrence (attention + cell)
        # stays inside the scan; the embedding gather and the whole output
        # head run batched over all T-1 steps, so the classifier sees one
        # [(T-1)*B, D] x [D, V] matmul instead of T-1 row-starved ones.
        # Identical math — only the matmul grouping (and dropout rng
        # consumption) differs.
        if isinstance(ss_prob, (int, float)) and float(ss_prob) == 0.0:
            emb_all = embedding_lookup(trainable["embed"], tokens)  # [T-1, B, E]

            def tf_step(carry, emb):
                h, c = carry
                context, alpha = additive_attention(
                    trainable["att"], features, ctx_enc, h
                )
                rnn_in = jnp.concatenate([emb, context], axis=-1)
                h, c = lstm_cell(trainable["lstm"], rnn_in, h, c)
                return (h, c), (h, context, alpha)

            (_, _), (hs, ctxs, alphas) = jax.lax.scan(tf_step, (h, c), emb_all)
            out = dense(trainable["c2o"], ctxs) + dense(trainable["h2o"], hs)
            out = dropout(rng, out, self.dropout_rate)
            logits = dense(trainable["classifier"], out)  # [T-1, B, V]
            logits = jnp.swapaxes(logits, 0, 1)
            alphas = jnp.swapaxes(alphas, 0, 1)
            mask = jnp.arange(T - 1)[None, :] < (lengths[:, None] - 1)
            return logits, mask, alphas

        steps = jnp.arange(T - 1)
        step_rngs = jax.random.split(rng, T - 1)

        def step(carry, xs):
            h, c, prev_pred = carry
            tok, t, r = xs
            r_ss, r_do = jax.random.split(r)
            # Scheduled sampling: with prob ss_prob use the model's own
            # previous prediction instead of ground truth (never at t=0,
            # where the input is <start>).
            use_model = (
                jax.random.uniform(r_ss, (B,)) < ss_prob
            ) & (t > 0)
            tok = jnp.where(use_model, prev_pred, tok)
            emb = embedding_lookup(trainable["embed"], tok)
            h, c, logits, alpha = self._step(
                trainable, features, ctx_enc, h, c, emb,
                r_do if self.dropout_rate > 0 else None,
            )
            return (h, c, jnp.argmax(logits, axis=-1)), (logits, alpha)

        (_, _, _), (logits, alphas) = jax.lax.scan(
            step,
            (h, c, jnp.zeros((B,), jnp.int32)),
            (tokens, steps, step_rngs),
        )
        logits = jnp.swapaxes(logits, 0, 1)  # [B, T-1, V]
        alphas = jnp.swapaxes(alphas, 0, 1)  # [B, T-1, L]
        mask = jnp.arange(T - 1)[None, :] < (lengths[:, None] - 1)
        return logits, mask, alphas

    # --- attention visualisation ------------------------------------------

    def greedy_with_attention(
        self, trainable: Params, features: jax.Array, max_len: int = 20
    ):
        """Greedy decode returning per-step attention maps — the
        Show-Attend-Tell paper's hallmark visualisation. Returns
        ``(ids [B, T], alphas [B, T, L])``; reshape alphas to the patch grid
        (e.g. 14x14 for 224px inputs) to overlay on the image."""
        from show_and_tell_tpu.utils.vocab import START_ID

        trainable, features = self._cast_for_compute(trainable, features)
        ctx_enc = encode_features(trainable["att"], features)
        h, c = self.init_lstm_state(trainable, features)
        c = c.astype(jnp.float32)
        B = features.shape[0]

        def step(carry, _):
            h, c, tok = carry
            emb = embedding_lookup(trainable["embed"], tok)
            h, c, logits, alpha = self._step(
                trainable, features, ctx_enc, h, c, emb
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (h, c, tok), (tok, alpha)

        _, (ids, alphas) = jax.lax.scan(
            step, (h, c, jnp.full((B,), START_ID, jnp.int32)), None, length=max_len
        )
        return jnp.swapaxes(ids, 0, 1), jnp.swapaxes(alphas, 0, 1)

    # --- decoding step interface -----------------------------------------

    def decode_state(self, trainable, batch_stats, features, beam_size: int = 1):
        """Uniform dispatch surface (decode.dispatch.decode_ids) shared with
        ShowTell: SAT has no batch stats (ignored) and pre-tiles the beam
        statics in the step closure, so callers pass tile=False onward."""
        step_fn, carry, first = self.make_decode_state(trainable, features, beam_size)
        return step_fn, carry, first, False

    def make_decode_state(
        self, trainable: Params, features: jax.Array, beam_size: int = 1
    ):
        """features [B, 196, 512] -> (step_fn, carry, first_logits=None).

        Decoding starts from the ``<start>`` token (id 1). The carry holds
        only the recurrent (h, c); the large per-image tensors (features,
        ctx_enc — identical across a beam group) live in the step closure,
        pre-tiled when ``beam_size > 1``, so beam search never re-gathers
        hundreds of MB of static data per step (pass ``tile=False`` to
        ``beam_search``)."""
        trainable, features = self._cast_for_compute(trainable, features)
        ctx_enc = encode_features(trainable["att"], features)
        h, c = self.init_lstm_state(trainable, features)
        c = c.astype(jnp.float32)
        if beam_size > 1:
            # Recurrent state is per-beam; image tensors stay untiled and the
            # beamed attention broadcasts over the beam axis (one HBM read of
            # features/ctx_enc per step regardless of k).
            h = jnp.repeat(h, beam_size, axis=0)
            c = jnp.repeat(c, beam_size, axis=0)
        carry = {"h": h, "c": c}
        k = beam_size

        def step_fn(carry, token_ids):
            emb = embedding_lookup(trainable["embed"], token_ids)
            h, c = carry["h"], carry["c"]
            if k > 1:
                context, _ = additive_attention_beamed(
                    trainable["att"], features, ctx_enc, h, k
                )
            else:
                context, _ = additive_attention(
                    trainable["att"], features, ctx_enc, h
                )
            rnn_in = jnp.concatenate([emb, context], axis=-1)
            h, c = lstm_cell(trainable["lstm"], rnn_in, h, c)
            out = dense(trainable["c2o"], context) + dense(trainable["h2o"], h)
            logits = dense(trainable["classifier"], out)
            return {"h": h, "c": c}, logits

        return step_fn, carry, None
