"""Pallas W4A16 matmul: bf16 activations x group-quantized int4 weights.

Why a kernel: int4 weights halve the decode-step HBM traffic vs int8,
but the jax client crashes on s4 jit arguments and the XLA-side
bitcast-unpack workaround materializes the dequantized copy
(tools/micro_int4*.py). Here the weights travel as nibble-packed uint8;
each program DMAs a packed tile into VMEM, sign-extends on the VPU, and
feeds the MXU — HBM reads stay 4-bit.

Packing is HALF-SPLIT, not interleaved: byte[d, j] holds out-channel j
in its low nibble and out-channel j + O/2 in its high nibble, so one
byte tile yields two contiguous weight tiles with no lane interleave
(Mosaic-friendly), and y = concat(y_lo, y_hi) is a plain reshape.

Quantization is RTN with per-(group of 128 input rows, out-channel)
fp32 scales — the standard W4 recipe; the scale multiplies each
group's partial product before accumulation, so grouping costs nothing
extra at run time.

Shapes:
  x:      (R, D)   bf16/f32 activations (R = B*T rows)
  w_p:    (D, O/2) uint8  packed weights
  w_g:    (D/G, 2, O/2) f32 scales  [:, 0]=low-half channels, [:, 1]=high
          (group dim leads so the per-group block (1, 2, O/2) satisfies
          Mosaic's last-two-dims tiling rule)
  -> y    (R, O)   f32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

GROUP = 128  # input-dim rows per scale group (= the kernel's D block)


def _kernel(x_ref, wp_ref, s_ref, out_ref, *, groups_per_block, group):
    d = pl.program_id(1)

    @pl.when(d == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # several scale-groups per grid step: the fixed per-step cost
    # (~5.6 us measured on v5e through this stack) dominates a single
    # 128-row group's ~1 us of DMA+MXU work
    acc_lo = jnp.zeros(out_ref.shape[1:], jnp.float32)
    acc_hi = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for g in range(groups_per_block):
        rows = slice(g * group, (g + 1) * group)
        x = x_ref[:, rows].astype(jnp.bfloat16)  # (R_blk, group)
        # i32 unpack: mosaic rejects sub-32-bit comparisons on this
        # target ("Target does not support this comparison" for i16)
        b = wp_ref[rows, :].astype(jnp.int32)  # (group, O2_blk)
        lo = b & 0xF
        lo = lo - (lo > 7).astype(jnp.int32) * 16  # sign-extend nibble
        hi = b >> 4
        hi = hi - (hi > 7).astype(jnp.int32) * 16
        s = s_ref[g]  # (2, O2_blk) f32
        acc_lo += jax.lax.dot_general(
            x, lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s[0]
        acc_hi += jax.lax.dot_general(
            x, hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * s[1]
    out_ref[0] += acc_lo
    out_ref[1] += acc_hi


@functools.partial(
    jax.jit, static_argnames=("interpret", "row_block", "group")
)
def w4a16_matmul(
    x: jnp.ndarray,  # (R, D)
    w_p: jnp.ndarray,  # (D, O/2) uint8
    w_g: jnp.ndarray,  # (D/group, 2, O/2) f32
    interpret: bool = False,
    row_block: int = 0,  # 0 = all rows in one block (decode); >0 tiles rows
    group: int = GROUP,
) -> jnp.ndarray:
    R, D = x.shape
    O2 = w_p.shape[1]
    assert D % group == 0, (D, group)
    rb = row_block or R
    assert R % rb == 0, (R, rb)
    n_groups = D // group
    # 4 groups (512 input rows) per grid step amortizes the fixed
    # per-step cost; fall back to fewer when the matrix is small
    gpb = 1
    for cand in (4, 2):  # 8 measured no better than 4 at 7B shapes
        if n_groups % cand == 0:
            gpb = cand
            break
    d_blk = gpb * group

    out = pl.pallas_call(
        functools.partial(_kernel, groups_per_block=gpb, group=group),
        grid=(R // rb, D // d_blk),
        in_specs=[
            pl.BlockSpec((rb, d_blk), lambda r, d: (r, d)),
            pl.BlockSpec((d_blk, O2), lambda r, d: (d, 0)),
            pl.BlockSpec((gpb, 2, O2), lambda r, d: (d, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, rb, O2), lambda r, d: (0, r, 0)),
        out_shape=jax.ShapeDtypeStruct((2, R, O2), jnp.float32),
        interpret=interpret,
    )(x, w_p, w_g)
    # (2, R, O/2) -> (R, O): low-half channels then high-half = plain concat
    return jnp.concatenate([out[0], out[1]], axis=-1)


def dequant_w4_xla(w_p: jnp.ndarray, w_g: jnp.ndarray, dtype=jnp.bfloat16):
    """In-graph dequantize for the prefill path (R too large for one VMEM
    out block). Materializes the (D, O) weight once per layer per forward
    — amortized over hundreds of prompt tokens; decode uses the kernel."""
    D, O2 = w_p.shape
    groups = w_g.shape[0]
    b = w_p.astype(jnp.int32)
    lo = b & 0xF
    lo = lo - (lo > 7).astype(jnp.int32) * 16
    hi = b >> 4
    hi = hi - (hi > 7).astype(jnp.int32) * 16
    q = jnp.concatenate([lo, hi], axis=1).astype(dtype)  # (D, O)
    scale = jnp.concatenate([w_g[:, 0], w_g[:, 1]], axis=1).astype(dtype)
    q = q.reshape(groups, D // groups, O2 * 2) * scale[:, None, :]
    return q.reshape(D, O2 * 2)


# ---------------------------------------------------------------------------
# host-side quantize / pack (numpy; used at checkpoint load time)
# ---------------------------------------------------------------------------


def effective_group(din: int, group: int = GROUP) -> int:
    """Mosaic's tiling rule: the kernel's D block (= the scale group) must
    be a multiple of 128 lanes or the whole input dim. Small test models
    fall back to one group per matrix."""
    if din % group == 0 and group % 128 == 0:
        return group
    return din


def quantize_w4(w, group: int = GROUP):
    """(D, O) float -> (w_p (D, O/2) uint8, w_g (D/group, 2, O/2) f32).

    RTN, symmetric, per-(group, out-channel) scales. ``group`` is clamped
    to a kernel-legal value via effective_group.
    """
    import numpy as np

    w = np.asarray(w, np.float32)
    D, O = w.shape
    group = effective_group(D, group)
    assert D % group == 0 and O % 2 == 0, (D, O)
    gshape = (D // group, group, O)
    amax = np.abs(w.reshape(gshape)).max(axis=1)  # (D/g, O)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(
        np.round(w.reshape(gshape) / scale[:, None, :]), -7, 7
    ).astype(np.int8).reshape(D, O)
    lo = q[:, : O // 2]
    hi = q[:, O // 2:]
    w_p = ((hi.astype(np.uint8) << 4) | (lo.astype(np.uint8) & 0xF)).astype(
        np.uint8
    )
    # (D/g, 2, O/2)
    w_g = np.stack([scale[:, : O // 2], scale[:, O // 2:]], axis=1)
    return w_p, w_g


def dequantize_w4(w_p, w_g):
    """Reference inverse for tests and the XLA fallback path. The group
    size is implied by the operands (``D // w_g.shape[0]``) — quantize_w4
    may have clamped the requested group via effective_group, so taking
    it as a parameter invited shape mismatches."""
    import numpy as np

    w_p = np.asarray(w_p)
    D, O2 = w_p.shape
    group = D // np.asarray(w_g).shape[0]
    lo = (w_p & 0xF).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = (w_p >> 4).astype(np.int8)
    hi = np.where(hi > 7, hi - 16, hi)
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)  # (D, O)
    scale = np.concatenate([w_g[:, 0], w_g[:, 1]], axis=1)  # (D/g, O)
    return (q.reshape(D // group, group, O2 * 2) * scale[:, None, :]).reshape(
        D, O2 * 2
    )
