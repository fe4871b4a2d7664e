"""Pallas TPU kernel: fused single-step LSTM cell for the decode frame.

The decode scan's per-frame LSTM step (ref: the numpy engine's fused
``[x;h]·W`` cell, JLM:decoder/ model file — SURVEY.md §4.2) previously ran
as XLA ops: one matmul plus ~10 separate VPU passes over ``[R, 4H]`` fp32
gate tensors in HBM (sigmoid×3, tanh×2, muls/adds), measured at
1.17 ms/frame on v5e for R=8192 — ~9x the matmul's MXU time.  This kernel
computes the whole cell in one pass: the gate pre-activations never leave
VMEM, and the only HBM traffic is x, (c, h) in and (c', h') out.

Layout: grid over row tiles; the fused weight ``[(E+H), 4H]`` stays
VMEM-resident across the grid (its block index is constant, so Pallas
loads it once).  The matmul is split ``x @ W_x + h @ W_h`` to avoid
materializing the concat.  Gate order i, j, f, o matches
:func:`jlm_tpu.models.lstm.lstm_step` exactly; the forget-gate bias is a
compile-time constant.

Used by the decode engine's speed path; gradients are not needed (decode
only), so there is no VJP.  Training keeps :mod:`jlm_tpu.ops.lstm_scan`
(time-block scan with custom VJP).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cell_kernel(
    x_ref,  # [TR, E] compute dtype
    h_ref,  # [TR, H] compute dtype
    c_ref,  # [TR, H] fp32 (or compute dtype)
    w_ref,  # [(E+H), 4H] compute dtype (VMEM-resident across grid)
    b_ref,  # [1, 4H] fp32
    c_out_ref,  # [TR, H] fp32
    h_out_ref,  # [TR, H] out dtype (compute dtype for the head kernel)
    *,
    E: int,
    H: int,
    forget_bias: float,
):
    z = (
        jnp.dot(x_ref[:], w_ref[:E, :], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], w_ref[E:, :], preferred_element_type=jnp.float32)
        + b_ref[0, :][None, :]
    )  # [TR, 4H] fp32, VMEM only
    i = z[:, :H]
    j = z[:, H : 2 * H]
    f = z[:, 2 * H : 3 * H]
    o = z[:, 3 * H :]
    c_new = (
        jax.nn.sigmoid(f + forget_bias) * c_ref[:].astype(jnp.float32)
        + jax.nn.sigmoid(i) * jnp.tanh(j)
    )
    c_out_ref[:] = c_new.astype(c_out_ref.dtype)
    h_out_ref[:] = (jax.nn.sigmoid(o) * jnp.tanh(c_new)).astype(
        h_out_ref.dtype
    )


def lstm_cell_step(
    x: jnp.ndarray,  # [R, E]
    h: jnp.ndarray,  # [R, H]
    c: jnp.ndarray,  # [R, H] (any float dtype — cast in-register)
    W: jnp.ndarray,  # [(E+H), 4H]
    b: jnp.ndarray,  # [4H]
    forget_bias: float = 1.0,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    c_out_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused LSTM cell step: returns ``(c', h')``.

    ``h'`` is emitted in ``compute_dtype`` (it feeds the projection kernel
    next); ``c'`` in ``c_out_dtype`` (default fp32).  ``c`` passes through
    in ITS OWN dtype and is cast to fp32 in-register — round 5: the old
    caller-side ``c.astype(fp32)`` materialized a 10 MB fp32 copy in HBM
    every frame just to feed a kernel that casts anyway, and the fp32
    ``c'`` was immediately cast back to the engine's bf16 ring cache
    (value-identical either way: one bf16 rounding of the fp32 in-kernel
    result).
    """
    R, E = x.shape
    H = h.shape[1]
    x = x.astype(compute_dtype)
    h = h.astype(compute_dtype)
    W = W.astype(compute_dtype)
    if c_out_dtype is None:
        c_out_dtype = jnp.float32
    cd_size = jnp.dtype(compute_dtype).itemsize
    c_size = c.dtype.itemsize
    co_size = jnp.dtype(c_out_dtype).itemsize

    # Row tile: largest that fits the ~13 MB budget next to the resident
    # weights.  Per-row bytes: x + h + c in (double-buffered), z + gate
    # temps (~3 fp32 [TR, 4H] passes at peak), c'/h' out (double-buffered).
    w_bytes = (E + H) * 4 * H * cd_size
    budget = 13 * 1024 * 1024 - w_bytes
    per_row = (
        2 * (E + H) * cd_size  # x + h in, double-buffered -> x2 below
        + 2 * H * c_size  # c in
        + 3 * 4 * H * 4  # z + gate temporaries (fp32)
        + 2 * H * (co_size + cd_size)  # c' + h' out, double-buffered
    )
    tr = 8
    while tr < 2048 and (tr * 2) * per_row <= budget and tr * 2 <= _round_up(R, 8):
        tr *= 2
    R_pad = _round_up(R, tr)
    if R_pad != R:
        x = jnp.pad(x, ((0, R_pad - R), (0, 0)))
        h = jnp.pad(h, ((0, R_pad - R), (0, 0)))
        c = jnp.pad(c, ((0, R_pad - R), (0, 0)))

    c_new, h_new = pl.pallas_call(
        functools.partial(
            _cell_kernel, E=E, H=H, forget_bias=float(forget_bias)
        ),
        grid=(R_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, E), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E + H, 4 * H), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tr, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R_pad, H), c_out_dtype),
            jax.ShapeDtypeStruct((R_pad, H), compute_dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R_pad * (E + H) * 4 * H,
            bytes_accessed=R_pad * ((E + 2 * H) * cd_size + 3 * H * 4),
            transcendentals=5 * R_pad * H,
        ),
        interpret=interpret,
    )(x, h, c, W, b.reshape(1, -1).astype(jnp.float32))
    return c_new[:R], h_new[:R]


def lstm_cell_ref(x, h, c, W, b, forget_bias=1.0):
    """jnp reference for kernel tests (mirrors models.lstm.lstm_step)."""
    z = jnp.concatenate([x, h], axis=1).astype(jnp.float32) @ W.astype(
        jnp.float32
    ) + b
    H = h.shape[1]
    i, j, f, o = z[:, :H], z[:, H:2*H], z[:, 2*H:3*H], z[:, 3*H:]
    c_new = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return c_new, h_new
