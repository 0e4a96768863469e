"""Show-and-Tell (Vinyals et al.): frozen CNN encoder + LSTM decoder.

Capability parity with the reference pair ``EncoderCNN``/``DecoderRNN``
(models.py:9-67):

- Encoder: frozen ResNet-152 trunk -> trainable Linear(2048 -> embed) init
  N(0, 0.02) (models.py:16,22-23) -> BatchNorm1d(embed, momentum=0.01)
  (models.py:17,28). The backbone is frozen (models.py:14-15) and wrapped in
  ``stop_gradient``; only the projection + BN train.
- Decoder: Embedding(V, E) init U(-0.1, 0.1); N-layer LSTM; Linear(H -> V)
  init U(-0.1, 0.1), bias 0 (models.py:41-45).
- Teacher-forced forward prepends the image feature as the step-0 input
  (models.py:49-50) and pairs step-t output with ``captions[:, 1 + t]``
  (the packed-target convention of train.py:134-139).
- Greedy sampling starts from the feature step and feeds argmax embeddings
  back (models.py:56-67) — ``<start>`` is never fed, faithfully.

TPU design: time loop is a ``lax.scan`` over *static* [B, T] batches with a
length mask (replacing sort + pack_padded_sequence, data_loader.py:48-62,
which is shape-hostile to XLA); the LSTM cell dispatches through ops/lstm.py
(XLA-fused by default, Pallas kernel opt-in — see its STATUS note).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models import encoders
from show_and_tell_tpu.models.layers import (
    batch_norm_inference,
    batch_norm_train,
    cast_tree,
    dense,
    embedding_lookup,
)
from show_and_tell_tpu.ops.lstm import init_lstm_params, lstm_cell

Params = Dict


class ShowTellModel:
    """Pure-function model; instances hold only static config."""

    def __init__(self, cfg: Config, vocab_size: int):
        self.cfg = cfg
        self.vocab_size = vocab_size
        self.encoder_name = cfg.encoder if cfg.encoder != "vgg16" else "resnet152"
        self.feature_dim = encoders.encoder_feature_dim(self.encoder_name)
        # bf16 matmuls / fp32 params+BN+cell-state (see show_attend_tell.py)
        self.cdtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

    # --- init -------------------------------------------------------------

    def init(self, key: jax.Array) -> Tuple[Params, Params]:
        """Returns ``(trainable, frozen)`` param trees."""
        cfg = self.cfg
        ks = jax.random.split(key, 6)
        proj_w = 0.02 * jax.random.normal(ks[0], (self.feature_dim, cfg.embed_size))
        trainable = {
            "proj": {"w": proj_w, "b": jnp.zeros((cfg.embed_size,))},
            "bn": {
                "scale": jnp.ones((cfg.embed_size,)),
                "bias": jnp.zeros((cfg.embed_size,)),
            },
            "embed": jax.random.uniform(
                ks[1], (self.vocab_size, cfg.embed_size), jnp.float32, -0.1, 0.1
            ),
            "lstm": [
                init_lstm_params(
                    jax.random.fold_in(ks[2], l),
                    cfg.embed_size if l == 0 else cfg.hidden_size,
                    cfg.hidden_size,
                )
                for l in range(cfg.num_layers)
            ],
            "out": {
                "w": jax.random.uniform(
                    ks[3], (cfg.hidden_size, self.vocab_size), jnp.float32, -0.1, 0.1
                ),
                "b": jnp.zeros((self.vocab_size,)),
            },
        }
        frozen = encoders.init_encoder(self.encoder_name, ks[4])
        return trainable, frozen

    def init_batch_stats(self) -> Params:
        return {
            "mean": jnp.zeros((self.cfg.embed_size,)),
            "var": jnp.ones((self.cfg.embed_size,)),
        }

    # --- encoder ----------------------------------------------------------

    def backbone_features(self, frozen: Params, images: jax.Array) -> jax.Array:
        """[B, 224, 224, 3] -> [B, feature_dim], gradient-stopped. A
        quantized tree (int8 PTQ + BN folding, models/quantize.py)
        dispatches to the int8 trunk."""
        from show_and_tell_tpu.models.quantize import backbone_features_q, is_quantized

        if is_quantized(frozen):
            return backbone_features_q(frozen, images)
        apply = encoders.encoder_apply(self.encoder_name)
        return jax.lax.stop_gradient(apply(frozen, images.astype(self.cdtype)))

    def _cast_for_compute(self, trainable: Params) -> Params:
        """Compute-dtype cast of the decoder matmul weights (LSTM bias and
        BN stay fp32)."""
        cd = self.cdtype
        t = dict(trainable)
        t["embed"] = trainable["embed"].astype(cd)
        t["out"] = cast_tree(trainable["out"], cd)
        t["lstm"] = [
            {"w": lp["w"].astype(cd), "b": lp["b"]} for lp in trainable["lstm"]
        ]
        return t

    def encode(
        self,
        trainable: Params,
        batch_stats: Params,
        features: jax.Array,
        train: bool,
    ) -> Tuple[jax.Array, Params]:
        """Project + BatchNorm the pooled backbone feature (models.py:25-29)."""
        f = dense(trainable["proj"], features)
        bn = {**trainable["bn"], "mean": batch_stats["mean"], "var": batch_stats["var"]}
        if train:
            y, new = batch_norm_train(bn, f, momentum=0.01)
            return y, {"mean": new["mean"], "var": new["var"]}
        return batch_norm_inference(bn, f), batch_stats

    # --- decoder ----------------------------------------------------------

    def _run_lstm_stack(self, trainable, x, state):
        """One time step through the layer stack. state: [(h, c)] * L."""
        new_state = []
        inp = x
        for l, p in enumerate(trainable["lstm"]):
            h, c = state[l]
            h, c = lstm_cell(p, inp, h, c)
            new_state.append((h, c))
            inp = h
        return inp, new_state

    def zero_state(self, batch: int):
        H = self.cfg.hidden_size
        return [
            (jnp.zeros((batch, H), self.cdtype), jnp.zeros((batch, H)))
            for _ in range(self.cfg.num_layers)
        ]

    def decode_train(
        self,
        trainable: Params,
        feat_embed: jax.Array,  # [B, E] (already projected + BN'd)
        captions: jax.Array,  # [B, T] int32 (full caption with <start>/<end>)
        lengths: jax.Array,  # [B] int32
        rng=None,
        ss_prob: float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        """Teacher-forced (optionally scheduled-sampled) logits.

        Inputs per step: [feature, emb(c_1) ... emb(c_{T-2})]; step-t output
        is scored against ``captions[:, 1 + t]`` with mask ``t < len - 1``.
        The feature step predicts the first real word c_1, and every later
        step consumes the token the previous step was trained to predict —
        exactly the conditioning greedy/beam inference reproduces
        (``make_decode_state`` feeds back the previous prediction). Note
        ``<start>`` (c_0) is never an input, matching the reference's
        ``sample`` (models.py:56-67), which also never feeds it.
        Scheduled sampling implements the hook the reference declares but
        never uses (``DecoderRNN.ss_prob``, models.py:38): for t >= 1, each
        sample's input token is the model's previous prediction with
        probability ``ss_prob``. Returns ``(logits [B,T-1,V], mask)``.
        """
        trainable = self._cast_for_compute(trainable)
        feat_embed = feat_embed.astype(self.cdtype)
        B, Tfull = captions.shape
        steps = Tfull - 1
        # input token at step t (t >= 1) is c_t — the token step t-1 was
        # trained to predict; step 0 uses the feature
        shifted = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), captions[:, 1:steps]], axis=1
        )
        tokens = jnp.swapaxes(shifted, 0, 1)  # [T-1, B]
        if rng is None:
            rng = jax.random.PRNGKey(0)

        # Static pure-teacher-forcing fast path (see show_attend_tell.py:
        # same reasoning): recurrence in the scan, output head batched over
        # all steps as one [(T-1)*B, H] x [H, V] matmul. Identical math.
        if isinstance(ss_prob, (int, float)) and float(ss_prob) == 0.0:
            xs = embedding_lookup(trainable["embed"], tokens)  # [T-1, B, E]
            xs = xs.at[0].set(feat_embed)  # step 0 consumes the image feature

            def tf_step(lstm_state, x):
                out, lstm_state = self._run_lstm_stack(trainable, x, lstm_state)
                return lstm_state, out

            _, outs = jax.lax.scan(tf_step, self.zero_state(B), xs)
            logits = jnp.swapaxes(dense(trainable["out"], outs), 0, 1)
            mask = jnp.arange(steps)[None, :] < (lengths[:, None] - 1)
            return logits, mask

        step_rngs = jax.random.split(rng, steps)
        ts = jnp.arange(steps)

        def step(state, xs):
            lstm_state, prev_pred = state
            tok, t, r = xs
            use_model = (jax.random.uniform(r, (B,)) < ss_prob) & (t > 0)
            tok = jnp.where(use_model, prev_pred, tok)
            x = jnp.where(
                t == 0,
                feat_embed,
                embedding_lookup(trainable["embed"], tok),
            )
            out, lstm_state = self._run_lstm_stack(trainable, x, lstm_state)
            logits = dense(trainable["out"], out)
            return (lstm_state, jnp.argmax(logits, axis=-1).astype(jnp.int32)), logits

        init = (self.zero_state(B), jnp.zeros((B,), jnp.int32))
        _, logits = jax.lax.scan(step, init, (tokens, ts, step_rngs))
        logits = jnp.swapaxes(logits, 0, 1)  # [B, T-1, V]
        mask = jnp.arange(steps)[None, :] < (lengths[:, None] - 1)
        return logits, mask

    # --- decoding step interface (for decode/greedy.py, decode/beam.py) ---

    def decode_state(self, trainable, batch_stats, features, beam_size: int = 1):
        """Uniform dispatch surface (decode.dispatch.decode_ids) shared with
        SAT: ShowTell's carry is small, so ``beam_search`` tiles it
        internally (tile=True); ``beam_size`` is handled there."""
        step_fn, carry, first = self.make_decode_state(trainable, batch_stats, features)
        return step_fn, carry, first, True

    def make_decode_state(self, trainable, batch_stats, features):
        """features [B, feature_dim] -> (step_fn, carry, first_logits).

        Step 0 consumes the image embedding (models.py:58); the returned
        ``first_logits`` are its predictions. Subsequent steps consume token
        ids via ``step_fn``.
        """
        f, _ = self.encode(trainable, batch_stats, features, train=False)
        trainable = self._cast_for_compute(trainable)
        f = f.astype(self.cdtype)
        state = self.zero_state(features.shape[0])
        out, state = self._run_lstm_stack(trainable, f, state)
        first_logits = dense(trainable["out"], out)

        def step_fn(carry, token_ids):
            x = embedding_lookup(trainable["embed"], token_ids)
            out, carry = self._run_lstm_stack(trainable, x, carry)
            return carry, dense(trainable["out"], out)

        return step_fn, state, first_logits
