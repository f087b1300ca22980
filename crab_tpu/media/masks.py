"""Ground-truth mask decoding for the AVS task family.

Mirrors the reference recipes: binary masks from grayscale>0 + nearest
resize (``quick_start_dataset.py:466-472``), AVSS color masks mapped to
71-class labels through the procedurally generated AVSBench palette
(``quick_start_dataset.py:35-73``).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=2)
def avs_palette(num_classes: int = 71) -> np.ndarray:
    """AVSBench-semantic unified palette, shape (num_classes, 3) uint8.

    Bit-interleaved VOC-style generation over base-8 digit triples; do not
    change — it defines the dataset's color coding.
    """
    pal = np.zeros((num_classes, 3), np.int32)
    for j in range(num_classes):
        lab = j
        i = 0
        while lab > 0:
            pal[j, 0] |= ((lab >> 0) & 1) << (7 - i)
            pal[j, 1] |= ((lab >> 1) & 1) << (7 - i)
            pal[j, 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return pal.astype(np.uint8)


def color_mask_to_label(mask_rgb: np.ndarray, palette: Optional[np.ndarray] = None) -> np.ndarray:
    """RGB color mask (H, W, 3) -> int label map (H, W).

    Pixels not matching any palette color map to 0 (background), same as
    the reference's argmax-over-equality trick.
    """
    if palette is None:
        palette = avs_palette()
    m = mask_rgb.astype(np.int32)
    eq = (m[None, :, :, :] == palette[:, None, None, :].astype(np.int32)).all(-1)
    # first matching class (reference: argmax over one-hot stack)
    return eq.argmax(axis=0).astype(np.int64)


def load_binary_mask(path: str, size: int = 224) -> np.ndarray:
    """Binary GT mask: gray>0 then nearest resize -> float32 (1, size, size)."""
    import cv2

    mask = cv2.imread(path)
    gray = cv2.cvtColor(mask, cv2.COLOR_BGR2GRAY)
    gt = (gray > 0).astype(np.float32)
    gt = cv2.resize(gt, (size, size), interpolation=cv2.INTER_NEAREST)
    return gt[None].astype(np.float32)


def save_mask_png(pred_logits: np.ndarray, path: str, avss: bool = False):
    """Save a predicted mask as PNG (``avss_utils.py:281-341`` analogue).

    binary: sigmoid>0.5 as 0/255 grayscale; avss: argmax class -> palette
    color.
    """
    from PIL import Image

    if avss:
        labels = pred_logits.argmax(axis=0).astype(np.int64)  # (H, W)
        rgb = avs_palette()[labels]
        Image.fromarray(rgb, "RGB").save(path)
    else:
        m = (1.0 / (1.0 + np.exp(-pred_logits[0])) > 0.5).astype(np.uint8) * 255
        Image.fromarray(m, "L").save(path)


def load_avss_label_mask(path: str, size: int = 224) -> np.ndarray:
    """AVSS GT: RGB palette mask, nearest resize, -> int64 (1, size, size)."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.Resampling.NEAREST)
    return color_mask_to_label(np.asarray(img))[None]
