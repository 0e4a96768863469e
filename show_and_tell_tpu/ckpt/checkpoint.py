"""Checkpointing: best-metric-gated model saves + full info histories.

Reference layout (train.py:156-196): every ``save_checkpoint_every``
iterations it writes ``infos.pkl`` with
``{total_iter, iter, epoch, best_val_score, opt, val_result_history,
loss_history, lr_history}``, and — only when the gate metric improves
(CIDEr if language_eval==1, else −val_loss, train.py:169-177) —
``model-best.pth`` + ``infos-best.pkl``.

This build keeps the same layout and gating but serialises params as
msgpack (``flax.serialization``) and infos as JSON — inspectable,
version-stable, and free of pickle's arbitrary-code-execution load hazard.
Unlike the reference's ``load_model``/``load_optimizer`` stubs
(train.py:60-64), loading is implemented.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

INFOS = "infos.json"
INFOS_BEST = "infos-best.json"
MODEL_BEST = "model-best.msgpack"


def _jsonable(obj):
    """Coerce numpy/jax scalars and arrays to native JSON types; anything
    else fails loudly. ``default=str`` here would silently stringify a
    numeric ``best_val_score``, and the resumed run would then compare
    float > str and crash at its first checkpoint — a write-time TypeError
    is strictly better than that."""
    if hasattr(obj, "item") and getattr(obj, "ndim", 1) == 0:
        return obj.item()
    if hasattr(obj, "tolist"):
        return obj.tolist()
    raise TypeError(f"not JSON-serializable in infos: {type(obj).__name__}")


def save_infos(expr_dir: str, infos: Dict, best: bool = False) -> str:
    os.makedirs(expr_dir, exist_ok=True)
    path = os.path.join(expr_dir, INFOS_BEST if best else INFOS)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(infos, f, indent=1, default=_jsonable)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn file
    return path


def load_infos(expr_dir: str, best: bool = False) -> Optional[Dict]:
    path = os.path.join(expr_dir, INFOS_BEST if best else INFOS)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_best(expr_dir: str, params: Any, batch_stats: Any, infos: Dict) -> str:
    """Write model-best + infos-best (the train.py:191-196 pair)."""
    os.makedirs(expr_dir, exist_ok=True)
    blob = serialization.to_bytes(
        {"params": params, "batch_stats": batch_stats}
    )
    path = os.path.join(expr_dir, MODEL_BEST)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    # pair consistency: write infos-best (its own atomic replace) BEFORE
    # publishing model-best, and only then rename the weights into place —
    # the slow work (serialize + write) all happens before the two renames,
    # so the window where the pair can disagree shrinks to the instants
    # between back-to-back os.replace calls (review fix: infos-best used
    # to be written after, leaving a full serialize+write window in which
    # a crash paired NEW weights with the PREVIOUS gate's infos)
    save_infos(expr_dir, infos, best=True)
    os.replace(tmp, path)
    return path


def load_best_params(
    expr_dir: str, params_template: Any, batch_stats_template: Any
) -> Optional[Tuple[Any, Any]]:
    path = os.path.join(expr_dir, MODEL_BEST)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        blob = f.read()
    restored = serialization.from_bytes(
        {"params": params_template, "batch_stats": batch_stats_template}, blob
    )
    return restored["params"], restored["batch_stats"]


# --- full train-state checkpoints (params + optimizer moments + step) -------
# The reference can only restart from weights (its ``load_optimizer`` is an
# empty stub, train.py:63-64), so a resumed run loses the Adam moments. These
# save/restore the complete TrainState for bit-continuous resume.

STATE_LAST = "state-last.msgpack"


def save_train_state(expr_dir: str, state: Any) -> str:
    os.makedirs(expr_dir, exist_ok=True)
    path = os.path.join(expr_dir, STATE_LAST)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, path)
    return path


def load_train_state(expr_dir: str, state_template: Any) -> Optional[Any]:
    path = os.path.join(expr_dir, STATE_LAST)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        blob = f.read()
    # EMA cross-version/cross-config compatibility (review fix: flax
    # from_bytes matches fields strictly, so the ema_params field added to
    # TrainState made every pre-EMA checkpoint unresumable):
    # - old blob without "ema_params" + template WITH an EMA tree: seed the
    #   average with the restored params (EMA = current weights at resume);
    # - old blob + template ema None: insert the missing None field;
    # - blob WITH a saved EMA + template ema None (run resumed with
    #   ema_decay=0): DROP the stale average — the step never updates it,
    #   and eval_params() would otherwise serve frozen step-N weights
    #   forever.
    state_dict = serialization.msgpack_restore(blob)
    tmpl_dict = serialization.to_state_dict(state_template)
    if "ema_params" in tmpl_dict or "ema_params" in state_dict:
        tmpl_ema = tmpl_dict.get("ema_params")
        blob_ema = state_dict.get("ema_params")
        if tmpl_ema is not None and blob_ema is None:
            state_dict["ema_params"] = state_dict["params"]
        elif tmpl_ema is None:
            state_dict["ema_params"] = None
    return serialization.from_state_dict(state_template, state_dict)
