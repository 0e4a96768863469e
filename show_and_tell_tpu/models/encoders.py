"""Pretrained CNN encoders, NHWC / XLA-native.

Three backbones mirroring the reference's usage:
- VGG16 conv trunk truncated after conv5_2+ReLU -> 14x14x512 feature grid
  (model2.py:15-16: ``features[:-3]``, giving [B,512,14,14] -> 196 patches).
- ResNet-152 -> pooled 2048-d vector (models.py:13: backbone for the classic
  Show-and-Tell encoder).
- Inception-v3 -> pooled 2048-d vector (the BASELINE.json scaled config).

All are *frozen feature extractors* (reference: models.py:14-15,
model2.py:87-89 set requires_grad=False); we run BatchNorm with frozen
running statistics and wrap calls in ``stop_gradient`` at the model level.

Weights import from a torchvision ``state_dict`` via the ``from_torch_*``
converters (zero-egress environments can convert a locally available
checkpoint; tests use random init — shapes and plumbing are identical).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.models.layers import (
    avg_pool,
    batch_norm_inference,
    conv2d,
    global_avg_pool,
    init_bn,
    init_conv,
    max_pool,
)

Params = Dict

# ---------------------------------------------------------------------------
# VGG16 conv trunk (config D), truncated after conv5_2 + ReLU
# ---------------------------------------------------------------------------

_VGG_CHANNELS = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512]
# torchvision ``features`` module indices of the 12 kept convs:
_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26]


def init_vgg16(key, dtype=jnp.float32) -> Params:
    convs = []
    cin = 3
    i = 0
    for ch in _VGG_CHANNELS:
        if ch == "M":
            continue
        convs.append(init_conv(jax.random.fold_in(key, i), 3, 3, cin, ch, bias=True, dtype=dtype))
        cin = ch
        i += 1
    return {"convs": convs}


def vgg16_features(params: Params, images: jax.Array) -> jax.Array:
    """images [B,224,224,3] -> feature grid [B, 196, 512]."""
    x = images
    ci = 0
    for ch in _VGG_CHANNELS:
        if ch == "M":
            x = max_pool(x, 2, 2)
        else:
            x = jax.nn.relu(conv2d(params["convs"][ci], x, stride=1, padding=1))
            ci += 1
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)  # [B, 196, 512] row-major patch order


def from_torch_vgg16(sd: Dict[str, np.ndarray]) -> Params:
    convs = []
    for idx in _VGG_TORCH_IDX:
        w = np.asarray(sd[f"features.{idx}.weight"])  # [cout,cin,kh,kw]
        b = np.asarray(sd[f"features.{idx}.bias"])
        convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
    return {"convs": convs}


# ---------------------------------------------------------------------------
# ResNet-152 (bottleneck v1, blocks [3, 8, 36, 3])
# ---------------------------------------------------------------------------

_RESNET152_BLOCKS = [3, 8, 36, 3]
_RESNET_WIDTHS = [64, 128, 256, 512]


def _init_bottleneck(key, cin, width, stride, dtype) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": init_conv(ks[0], 1, 1, cin, width, bias=False, dtype=dtype),
        "bn1": init_bn(width, dtype),
        "conv2": init_conv(ks[1], 3, 3, width, width, bias=False, dtype=dtype),
        "bn2": init_bn(width, dtype),
        "conv3": init_conv(ks[2], 1, 1, width, width * 4, bias=False, dtype=dtype),
        "bn3": init_bn(width * 4, dtype),
    }
    if stride != 1 or cin != width * 4:
        p["down_conv"] = init_conv(ks[3], 1, 1, cin, width * 4, bias=False, dtype=dtype)
        p["down_bn"] = init_bn(width * 4, dtype)
    return p


def init_resnet152(key, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    layers: List[List[Params]] = []
    cin = 64
    for li, (n, width) in enumerate(zip(_RESNET152_BLOCKS, _RESNET_WIDTHS)):
        blocks = []
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            blocks.append(
                _init_bottleneck(jax.random.fold_in(ks[li], bi), cin, width, stride, dtype)
            )
            cin = width * 4
        layers.append(blocks)
    return {
        "stem_conv": init_conv(ks[4], 7, 7, 3, 64, bias=False, dtype=dtype),
        "stem_bn": init_bn(64, dtype),
        "layers": layers,
    }


def _bottleneck(p: Params, x: jax.Array, stride: int) -> jax.Array:
    y = jax.nn.relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x)))
    y = jax.nn.relu(batch_norm_inference(p["bn2"], conv2d(p["conv2"], y, stride=stride, padding=1)))
    y = batch_norm_inference(p["bn3"], conv2d(p["conv3"], y))
    if "down_conv" in p:
        x = batch_norm_inference(p["down_bn"], conv2d(p["down_conv"], x, stride=stride))
    return jax.nn.relu(x + y)


def resnet152_features(params: Params, images: jax.Array) -> jax.Array:
    """images [B,224,224,3] -> pooled [B, 2048]."""
    x = conv2d(params["stem_conv"], images, stride=2, padding=3)
    x = jax.nn.relu(batch_norm_inference(params["stem_bn"], x))
    x = max_pool(x, 3, 2, padding=1)
    for li, blocks in enumerate(params["layers"]):
        for bi, blk in enumerate(blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            x = _bottleneck(blk, x, stride)
    return global_avg_pool(x)


def _t_conv(sd, name) -> Params:
    w = np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)
    p = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return p


def _t_bn(sd, name) -> Params:
    return {
        "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
        "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
        "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"])),
        "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"])),
    }


def from_torch_resnet152(sd: Dict[str, np.ndarray]) -> Params:
    layers = []
    for li, n in enumerate(_RESNET152_BLOCKS, start=1):
        blocks = []
        for bi in range(n):
            pre = f"layer{li}.{bi}"
            blk = {
                "conv1": _t_conv(sd, f"{pre}.conv1"),
                "bn1": _t_bn(sd, f"{pre}.bn1"),
                "conv2": _t_conv(sd, f"{pre}.conv2"),
                "bn2": _t_bn(sd, f"{pre}.bn2"),
                "conv3": _t_conv(sd, f"{pre}.conv3"),
                "bn3": _t_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = _t_conv(sd, f"{pre}.downsample.0")
                blk["down_bn"] = _t_bn(sd, f"{pre}.downsample.1")
            blocks.append(blk)
        layers.append(blocks)
    return {
        "stem_conv": _t_conv(sd, "conv1"),
        "stem_bn": _t_bn(sd, "bn1"),
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Inception-v3 (BASELINE.json scaled config encoder)
# ---------------------------------------------------------------------------


def _init_basic(key, kh, kw, cin, cout, dtype) -> Params:
    return {
        "conv": init_conv(key, kh, kw, cin, cout, bias=False, dtype=dtype),
        "bn": init_bn(cout, dtype),
    }


def _basic(p: Params, x, stride=1, padding="VALID") -> jax.Array:
    # torchvision BasicConv2d: conv (no bias) -> BN(eps=1e-3) -> ReLU
    return jax.nn.relu(batch_norm_inference(p["bn"], conv2d(p["conv"], x, stride, padding), eps=1e-3))


def init_inception_v3(key, dtype=jnp.float32) -> Params:
    k = iter(jax.random.split(key, 128))

    def basic(kh, kw, cin, cout):
        return _init_basic(next(k), kh, kw, cin, cout, dtype)

    p: Params = {
        "Conv2d_1a_3x3": basic(3, 3, 3, 32),
        "Conv2d_2a_3x3": basic(3, 3, 32, 32),
        "Conv2d_2b_3x3": basic(3, 3, 32, 64),
        "Conv2d_3b_1x1": basic(1, 1, 64, 80),
        "Conv2d_4a_3x3": basic(3, 3, 80, 192),
    }
    # InceptionA (Mixed_5b/5c/5d): pool_features 32, 64, 64; cin 192, 256, 288
    for name, cin, pf in [("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64), ("Mixed_5d", 288, 64)]:
        p[name] = {
            "branch1x1": basic(1, 1, cin, 64),
            "branch5x5_1": basic(1, 1, cin, 48),
            "branch5x5_2": basic(5, 5, 48, 64),
            "branch3x3dbl_1": basic(1, 1, cin, 64),
            "branch3x3dbl_2": basic(3, 3, 64, 96),
            "branch3x3dbl_3": basic(3, 3, 96, 96),
            "branch_pool": basic(1, 1, cin, pf),
        }
    # InceptionB (Mixed_6a): cin 288
    p["Mixed_6a"] = {
        "branch3x3": basic(3, 3, 288, 384),
        "branch3x3dbl_1": basic(1, 1, 288, 64),
        "branch3x3dbl_2": basic(3, 3, 64, 96),
        "branch3x3dbl_3": basic(3, 3, 96, 96),
    }
    # InceptionC (Mixed_6b..6e): c7 = 128,160,160,192; cin 768
    for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        p[name] = {
            "branch1x1": basic(1, 1, 768, 192),
            "branch7x7_1": basic(1, 1, 768, c7),
            "branch7x7_2": basic(1, 7, c7, c7),
            "branch7x7_3": basic(7, 1, c7, 192),
            "branch7x7dbl_1": basic(1, 1, 768, c7),
            "branch7x7dbl_2": basic(7, 1, c7, c7),
            "branch7x7dbl_3": basic(1, 7, c7, c7),
            "branch7x7dbl_4": basic(7, 1, c7, c7),
            "branch7x7dbl_5": basic(1, 7, c7, 192),
            "branch_pool": basic(1, 1, 768, 192),
        }
    # InceptionD (Mixed_7a): cin 768
    p["Mixed_7a"] = {
        "branch3x3_1": basic(1, 1, 768, 192),
        "branch3x3_2": basic(3, 3, 192, 320),
        "branch7x7x3_1": basic(1, 1, 768, 192),
        "branch7x7x3_2": basic(1, 7, 192, 192),
        "branch7x7x3_3": basic(7, 1, 192, 192),
        "branch7x7x3_4": basic(3, 3, 192, 192),
    }
    # InceptionE (Mixed_7b/7c): cin 1280, 2048
    for name, cin in [("Mixed_7b", 1280), ("Mixed_7c", 2048)]:
        p[name] = {
            "branch1x1": basic(1, 1, cin, 320),
            "branch3x3_1": basic(1, 1, cin, 384),
            "branch3x3_2a": basic(1, 3, 384, 384),
            "branch3x3_2b": basic(3, 1, 384, 384),
            "branch3x3dbl_1": basic(1, 1, cin, 448),
            "branch3x3dbl_2": basic(3, 3, 448, 384),
            "branch3x3dbl_3a": basic(1, 3, 384, 384),
            "branch3x3dbl_3b": basic(3, 1, 384, 384),
            "branch_pool": basic(1, 1, cin, 192),
        }
    return p


def _inc_a(p, x, basic=_basic):
    b1 = basic(p["branch1x1"], x)
    b5 = basic(p["branch5x5_2"], basic(p["branch5x5_1"], x), padding=2)
    b3 = basic(p["branch3x3dbl_1"], x)
    b3 = basic(p["branch3x3dbl_2"], b3, padding=1)
    b3 = basic(p["branch3x3dbl_3"], b3, padding=1)
    bp = basic(p["branch_pool"], avg_pool(x, 3, 1, [(0, 0), (1, 1), (1, 1), (0, 0)]))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inc_b(p, x, basic=_basic):
    b3 = basic(p["branch3x3"], x, stride=2)
    bd = basic(p["branch3x3dbl_1"], x)
    bd = basic(p["branch3x3dbl_2"], bd, padding=1)
    bd = basic(p["branch3x3dbl_3"], bd, stride=2)
    bp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inc_c(p, x, basic=_basic):
    b1 = basic(p["branch1x1"], x)
    b7 = basic(p["branch7x7_1"], x)
    b7 = basic(p["branch7x7_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = basic(p["branch7x7_3"], b7, padding=[(3, 3), (0, 0)])
    bd = basic(p["branch7x7dbl_1"], x)
    bd = basic(p["branch7x7dbl_2"], bd, padding=[(3, 3), (0, 0)])
    bd = basic(p["branch7x7dbl_3"], bd, padding=[(0, 0), (3, 3)])
    bd = basic(p["branch7x7dbl_4"], bd, padding=[(3, 3), (0, 0)])
    bd = basic(p["branch7x7dbl_5"], bd, padding=[(0, 0), (3, 3)])
    bp = basic(p["branch_pool"], avg_pool(x, 3, 1, [(0, 0), (1, 1), (1, 1), (0, 0)]))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inc_d(p, x, basic=_basic):
    b3 = basic(p["branch3x3_2"], basic(p["branch3x3_1"], x), stride=2)
    b7 = basic(p["branch7x7x3_1"], x)
    b7 = basic(p["branch7x7x3_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = basic(p["branch7x7x3_3"], b7, padding=[(3, 3), (0, 0)])
    b7 = basic(p["branch7x7x3_4"], b7, stride=2)
    bp = max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inc_e(p, x, basic=_basic):
    b1 = basic(p["branch1x1"], x)
    b3 = basic(p["branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            basic(p["branch3x3_2a"], b3, padding=[(0, 0), (1, 1)]),
            basic(p["branch3x3_2b"], b3, padding=[(1, 1), (0, 0)]),
        ],
        axis=-1,
    )
    bd = basic(p["branch3x3dbl_1"], x)
    bd = basic(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate(
        [
            basic(p["branch3x3dbl_3a"], bd, padding=[(0, 0), (1, 1)]),
            basic(p["branch3x3dbl_3b"], bd, padding=[(1, 1), (0, 0)]),
        ],
        axis=-1,
    )
    bp = basic(p["branch_pool"], avg_pool(x, 3, 1, [(0, 0), (1, 1), (1, 1), (0, 0)]))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3_features(params: Params, images: jax.Array, basic=_basic) -> jax.Array:
    """images [B,299,299,3] -> pooled [B, 2048].

    ``basic`` injects how each BasicConv2d node is applied, so this ONE
    wiring definition serves the f32 forward, the int8 forward, and the
    PTQ calibration replay (models/quantize.py) — three consumers, zero
    duplicated topology."""
    x = basic(params["Conv2d_1a_3x3"], images, stride=2)
    x = basic(params["Conv2d_2a_3x3"], x)
    x = basic(params["Conv2d_2b_3x3"], x, padding=1)
    x = max_pool(x, 3, 2)
    x = basic(params["Conv2d_3b_1x1"], x)
    x = basic(params["Conv2d_4a_3x3"], x)
    x = max_pool(x, 3, 2)
    for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        x = _inc_a(params[name], x, basic)
    x = _inc_b(params["Mixed_6a"], x, basic)
    for name in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        x = _inc_c(params[name], x, basic)
    x = _inc_d(params["Mixed_7a"], x, basic)
    for name in ["Mixed_7b", "Mixed_7c"]:
        x = _inc_e(params[name], x, basic)
    return global_avg_pool(x)


def from_torch_inception_v3(sd: Dict[str, np.ndarray]) -> Params:
    p: Params = {}
    blocks: Dict[str, List[str]] = {}
    for key in sd:
        if not key.endswith(".conv.weight"):
            continue
        block, branch = key.split(".")[0], key.split(".")[1]
        if block.startswith("AuxLogits") or block == "fc":
            continue
        if block.startswith("Conv2d"):
            p[block] = {"conv": _t_conv(sd, f"{block}.conv"), "bn": _t_bn(sd, f"{block}.bn")}
        else:
            blocks.setdefault(block, []).append(branch)
    for block, branches in blocks.items():
        p[block] = {
            br: {"conv": _t_conv(sd, f"{block}.{br}.conv"), "bn": _t_bn(sd, f"{block}.{br}.bn")}
            for br in branches
        }
    return p


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

ENCODERS = {
    "vgg16": (init_vgg16, vgg16_features, from_torch_vgg16, 512),
    "resnet152": (init_resnet152, resnet152_features, from_torch_resnet152, 2048),
    "inception_v3": (init_inception_v3, inception_v3_features, from_torch_inception_v3, 2048),
}


def init_encoder(name: str, key, dtype=jnp.float32) -> Params:
    return ENCODERS[name][0](key, dtype)


def encoder_apply(name: str):
    return ENCODERS[name][1]


def encoder_feature_dim(name: str) -> int:
    return ENCODERS[name][3]


def load_torch_encoder(name: str, path: str) -> Params:
    """Convert a torchvision state_dict checkpoint saved at ``path``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return ENCODERS[name][2](sd)
