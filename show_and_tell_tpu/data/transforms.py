"""Device-side image transforms — the fused input pipeline's compute half.

The reference does per-item PIL transforms in DataLoader worker processes
(RandomCrop(224) + HorizontalFlip + ToTensor + Normalize for train;
CenterCrop for eval; main.py:26-36). Here the host only decodes resized
256x256 uint8 images; crop/flip/normalize run **on device, batched, inside
the jitted step** — uint8 across PCIe (4x smaller than fp32), one fused XLA
kernel instead of per-item Python.

ImageNet normalisation constants match main.py:30.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8/float [B,H,W,3] -> normalized float [B,H,W,3]."""
    x = images.astype(jnp.float32) / 255.0 if images.dtype == jnp.uint8 else images.astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def center_crop(images: jax.Array, crop: int) -> jax.Array:
    B, H, W, C = images.shape
    top, left = (H - crop) // 2, (W - crop) // 2
    return jax.lax.dynamic_slice(
        images, (0, top, left, 0), (B, crop, crop, C)
    )


def random_crop_flip(
    rng: jax.Array, images: jax.Array, crop: int
) -> jax.Array:
    """Per-image random crop + horizontal flip, vectorised (no Python loop)."""
    B, H, W, C = images.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    tops = jax.random.randint(k1, (B,), 0, H - crop + 1)
    lefts = jax.random.randint(k2, (B,), 0, W - crop + 1)
    flips = jax.random.bernoulli(k3, 0.5, (B,))

    def one(img, top, left, flip):
        patch = jax.lax.dynamic_slice(img, (top, left, 0), (crop, crop, C))
        return jnp.where(flip, patch[:, ::-1, :], patch)

    return jax.vmap(one)(images, tops, lefts, flips)


def train_transform(rng: jax.Array, images_u8: jax.Array, crop: int, dtype=jnp.float32) -> jax.Array:
    """RandomCrop + HFlip + Normalize (main.py:26-30), fused on device."""
    return normalize(random_crop_flip(rng, images_u8, crop), dtype)


def eval_transform(images_u8: jax.Array, crop: int, dtype=jnp.float32) -> jax.Array:
    """CenterCrop + Normalize (main.py:32-36), fused on device."""
    return normalize(center_crop(images_u8, crop), dtype)


def resize_bilinear(images: jax.Array, size: int) -> jax.Array:
    """On-device batched bilinear resize to size x size (the squash-resize
    the reference does offline with scipy.misc.imresize, preprocess.py:88).
    Lets the pipeline ingest native-resolution frames without a host resize
    pass."""
    B, H, W, C = images.shape
    out = jax.image.resize(
        images.astype(jnp.float32), (B, size, size, C), method="bilinear"
    )
    return out


def resize_transform(
    images: jax.Array, size: int, crop: int, train: bool = False,
    rng: jax.Array = None, dtype=jnp.float32,
) -> jax.Array:
    """Full fused device path: resize -> (random|center) crop/flip ->
    normalize. Accepts uint8 (0..255) or already-0..1 float inputs."""
    # resize_bilinear outputs float32 but KEEPS the input's value range, so
    # rescale uint8-range inputs to 0..1 here — normalize's uint8 branch
    # can't fire on the float resize output.
    x = resize_bilinear(images, size)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    if train:
        return normalize(random_crop_flip(rng, x, crop), dtype)
    return normalize(center_crop(x, crop), dtype)
