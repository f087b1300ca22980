"""Host-side image/video decode + on-device CLIP preprocessing.

The reference decodes with decord (C++ FFmpeg) and preprocesses with
``CLIPImageProcessor`` on CPU (``dataset/quick_start_dataset.py:300-312``).
Here the host only decodes+resizes frames (cv2 for video, PIL bicubic for
stills, matching the reference's PIL path); rescale + normalize run on
device fused into the ViT's first matmul.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_normalize(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., H, W, 3) -> normalized float (..., 3, H, W) on device."""
    x = jnp.asarray(frames_u8).astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
    return jnp.moveaxis(x, -1, -3)


def load_image(path: str, image_size: int = 224) -> np.ndarray:
    """Load a still image -> uint8 (H, W, 3), PIL bicubic resize.

    Matches ``Image.open(path).convert('RGB').resize((224,224))``
    (``quick_start_dataset.py:456-459``).
    """
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((image_size, image_size))
    return np.asarray(img, np.uint8)


def uniform_frame_indices(num_frames_total: int, n: int) -> List[int]:
    """The reference's frame sampler: arange(0, vlen, vlen/n) ints."""
    n = min(n, num_frames_total)
    return np.arange(0, num_frames_total, num_frames_total / n).astype(int).tolist()[:n]


def load_video_frames(
    path: str, num_frames: int = 10, image_size: int = 224
) -> np.ndarray:
    """Decode `num_frames` uniform frames -> uint8 (T, H, W, 3).

    cv2 (FFmpeg-backed) replaces decord; bilinear resize to image_size
    mirrors decord's VideoReader(height=..., width=...) behavior.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if vlen <= 0:
        # some containers don't report frame count; decode to count
        frames_all = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames_all.append(frame)
        cap.release()
        vlen = len(frames_all)
        if vlen == 0:
            raise IOError(f"no frames decoded from {path}")
        idxs = uniform_frame_indices(vlen, num_frames)
        sel = [frames_all[i] for i in idxs]
    else:
        idxs = uniform_frame_indices(vlen, num_frames)
        # seek-based sampling: decoding every frame up to the last index
        # costs seconds per clip on a single host core
        sel = []
        last = None
        for i in idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, i)
            ok, frame = cap.read()
            if ok:
                last = frame
            sel.append(last)
        cap.release()
        if sel and sel[0] is None:  # leading seek failures: backfill
            first = next((f for f in sel if f is not None), None)
            if first is None:
                raise IOError(f"no frames decoded from {path}")
            sel = [f if f is not None else first for f in sel]
    out = []
    for f in sel:
        f = cv2.resize(f, (image_size, image_size), interpolation=cv2.INTER_LINEAR)
        out.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    return np.stack(out, axis=0).astype(np.uint8)
