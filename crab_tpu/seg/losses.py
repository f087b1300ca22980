"""Segmentation losses (parity with ``models/loss.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import optax


def dice_loss(inputs, targets, num_masks: float, scale: float = 1000.0, eps: float = 1e-6):
    """inputs/targets (N, H, W); sigmoid-dice, ``loss.py:7-30``."""
    x = jax.nn.sigmoid(inputs).reshape(inputs.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    numerator = 2.0 * jnp.sum(x / scale * t, axis=-1)
    denominator = jnp.sum(x / scale, axis=-1) + jnp.sum(t / scale, axis=-1)
    loss = 1.0 - (numerator + eps) / (denominator + eps)
    return jnp.sum(loss) / (num_masks + 1e-8)


def sigmoid_ce_loss(inputs, targets, num_masks: float):
    """Per-pixel BCE-with-logits, mean over pixels, sum over masks
    (``loss.py:34-51``)."""
    loss = optax.sigmoid_binary_cross_entropy(inputs, targets)
    loss = loss.reshape(loss.shape[0], -1).mean(axis=1)
    return jnp.sum(loss) / (num_masks + 1e-8)


def avss_ce_loss(pred_mask, gt_labels):
    """71-class CE summed over batch (``loss.py:100-119``).

    pred_mask (N, C, H, W) logits; gt_labels (N, H, W) int.
    """
    logits = jnp.moveaxis(pred_mask, 1, -1)  # (N, H, W, C)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, gt_labels)
    return jnp.sum(ce.mean(axis=(-1, -2)))
