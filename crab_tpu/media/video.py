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


# ---------------------------------------------------------------------
# Codec-native YUV420 wire format
#
# H.264/H.265 store frames as YUV 4:2:0 — the decoder's native output is
# Y (H, W) + U, V (H/2, W/2) planes; the RGB every host pipeline ships is
# *derived* from them. Shipping the planes and converting on device
# halves the video host->device bytes (1.5 B/px -> RGB's 3 B/px) with no
# information loss for file-decoded video. The host reference conversion
# (`yuv420_to_rgb_host`) and the device one (`yuv420_to_rgb`) use the
# same integer BT.601 arithmetic, so the two paths are bit-identical —
# tested in tests/test_media.py. (The reference ships decord's RGB over
# PCIe — `dataset/unified_dataset.py:719` — where bytes are free; over a
# bandwidth-limited host link the planes are the right wire format.)
#
# Packed layout: one uint8 array (..., H*3//2, W) = the standard I420
# buffer (Y plane rows, then U then V planes flattened into W-wide rows).
# ---------------------------------------------------------------------


def _yuv_split(packed):
    """(..., H*3//2, W) -> Y (..., H, W), U, V (..., H//2, W//2)."""
    H = packed.shape[-2] * 2 // 3
    W = packed.shape[-1]
    y = packed[..., :H, :]
    tail = packed[..., H:, :].reshape(packed.shape[:-2] + (2, H // 2, W // 2))
    return y, tail[..., 0, :, :], tail[..., 1, :, :]


def rgb_to_yuv420(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB (..., H, W, 3) -> packed I420 uint8 (..., H*3//2, W).

    BT.601 limited-range integer math (the fixed-point form video
    encoders use); chroma = rounded mean of the 2x2 block's per-pixel
    U/V. H and W must be even.
    """
    f = frames_u8.astype(np.int32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128

    def sub(c):
        s = c.shape
        c = c.reshape(s[:-2] + (s[-2] // 2, 2, s[-1] // 2, 2))
        return (c.sum(axis=(-3, -1)) + 2) >> 2

    u, v = sub(u), sub(v)
    H, W = y.shape[-2], y.shape[-1]
    tail = np.stack([u, v], axis=-3).reshape(y.shape[:-2] + (H // 2, W))
    return np.concatenate([y, tail], axis=-2).astype(np.uint8)


def _yuv420_to_rgb_math(xp, y, u, v):
    """Shared integer BT.601 inverse; xp is numpy or jax.numpy."""
    up = xp.repeat(xp.repeat(u, 2, axis=-2), 2, axis=-1)
    vp = xp.repeat(xp.repeat(v, 2, axis=-2), 2, axis=-1)
    c = y.astype(xp.int32) - 16
    d = up.astype(xp.int32) - 128
    e = vp.astype(xp.int32) - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    rgb = xp.stack([r, g, b], axis=-1)
    return xp.clip(rgb, 0, 255).astype(xp.uint8)


def yuv420_to_rgb_host(packed: np.ndarray) -> np.ndarray:
    """Host (numpy) reference: packed I420 -> uint8 RGB (..., H, W, 3).
    Nearest chroma upsample; bit-identical to the device conversion."""
    return _yuv420_to_rgb_math(np, *_yuv_split(np.asarray(packed)))


def yuv420_to_rgb(packed: jnp.ndarray) -> jnp.ndarray:
    """Device (XLA) conversion: packed I420 -> uint8 RGB. Runs inside the
    encode program (cheap VPU integer work next to the CLIP matmuls)."""
    return _yuv420_to_rgb_math(jnp, *_yuv_split(jnp.asarray(packed)))


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


def load_video_frames_yuv(
    path: str, num_frames: int = 10, image_size: int = 224
) -> np.ndarray:
    """Decode uniform frames -> packed I420 uint8 (T, H*3//2, W).

    The wire-efficient serving path: half the host->device bytes of the
    RGB form (`load_video_frames`). cv2's capture API only exposes the
    converted BGR frames, so this re-packs after resize; a decoder that
    hands out the raw planes (FFmpeg sws-less path) would skip the round
    trip. Device-side `yuv420_to_rgb` restores RGB bit-identically to
    `yuv420_to_rgb_host`.
    """
    return rgb_to_yuv420(load_video_frames(path, num_frames, image_size))
