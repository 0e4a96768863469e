"""Attention-map visualisation — the Show-Attend-Tell paper's hallmark
figure (one panel per decode step, the word's attention highlighting where
the model looked). Pure PIL + numpy; no plotting dependencies.

The reference has no visualisation code at all; this renders the alphas
returned by ``ShowAttendTellModel.greedy_with_attention`` (ids [B, T],
alphas [B, T, L] with L the patch-grid size, e.g. 196 = 14x14 for 224px).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np


def model_view(image_u8: np.ndarray, crop: int) -> np.ndarray:
    """Host-side mirror of ``transforms.center_crop`` for one image: the
    region the model actually attended over. Attention grids cover the
    ``crop_size`` center crop, not the full frame — overlaying on the
    uncropped image stretches the heatmap by H/crop and shifts it by the
    crop border (review fix: every sheet was geometrically off by the
    16px border at 256->224). Render sheets on this view."""
    H, W = image_u8.shape[:2]
    if crop >= H and crop >= W:
        return image_u8
    top, left = max((H - crop) // 2, 0), max((W - crop) // 2, 0)
    return image_u8[top : top + crop, left : left + crop]


def attention_overlay(
    image_u8: np.ndarray, alpha: np.ndarray, gamma: float = 0.6
) -> np.ndarray:
    """One step's overlay: brighten the image where attention mass sits.

    ``image_u8`` [H, W, 3] uint8; ``alpha`` [L] with L a square grid.
    Returns [H, W, 3] uint8: ``img * (0.3 + 0.7 * heat**gamma)`` where heat
    is the max-normalised alpha upsampled bilinearly to the image size.
    """
    from PIL import Image

    H, W = image_u8.shape[:2]
    g = int(round(math.sqrt(alpha.size)))
    assert g * g == alpha.size, f"alpha size {alpha.size} is not a square grid"
    heat = alpha.reshape(g, g).astype(np.float32)
    heat = heat / max(float(heat.max()), 1e-8)
    heat_img = Image.fromarray((heat * 255).astype(np.uint8)).resize(
        (W, H), Image.BILINEAR
    )
    heat = np.asarray(heat_img, np.float32) / 255.0
    mask = 0.3 + 0.7 * heat[..., None] ** gamma
    return np.clip(image_u8.astype(np.float32) * mask, 0, 255).astype(np.uint8)


def attention_sheet(
    image_u8: np.ndarray,
    alphas: np.ndarray,  # [T, L]
    words: Sequence[str],
    max_cols: int = 5,
    label_height: int = 14,
) -> "object":
    """Contact sheet: original image + one attention overlay per word, each
    panel captioned with its word. Returns a PIL Image."""
    from PIL import Image, ImageDraw

    T = min(len(words), alphas.shape[0])
    panels = [("input", image_u8)] + [
        (words[t], attention_overlay(image_u8, alphas[t])) for t in range(T)
    ]
    H, W = image_u8.shape[:2]
    cols = min(max_cols, len(panels))
    rows = math.ceil(len(panels) / cols)
    sheet = Image.new(
        "RGB", (cols * W, rows * (H + label_height)), (255, 255, 255)
    )
    draw = ImageDraw.Draw(sheet)
    for i, (word, panel) in enumerate(panels):
        r, c = divmod(i, cols)
        x, y = c * W, r * (H + label_height)
        sheet.paste(Image.fromarray(panel), (x, y))
        draw.text((x + 2, y + H), word, fill=(0, 0, 0))
    return sheet


def save_attention_sheets(
    images_u8: np.ndarray,  # [B, H, W, 3]
    ids: np.ndarray,  # [B, T]
    alphas: np.ndarray,  # [B, T, L]
    vocab,
    out_paths: Sequence[str],
    max_words: Optional[int] = None,
) -> List[str]:
    """Render one sheet per image, truncating each caption at ``<end>``.

    ``vocab``: a :class:`Vocabulary` (uses ``decode_batch`` word splitting).
    Returns the written paths."""
    sentences = vocab.decode_batch(np.asarray(ids))
    written = []
    for b, path in enumerate(out_paths):
        words = sentences[b].split()
        if max_words:
            words = words[:max_words]
        if not words:  # degenerate decode: still show the input panel
            words = ["<no caption>"]
        sheet = attention_sheet(np.asarray(images_u8[b]), np.asarray(alphas[b]), words)
        sheet.save(path)
        written.append(path)
    return written
