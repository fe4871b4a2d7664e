"""Pallas TPU kernel: fused LSTM cell + time-block scan.

Native kernel #1 of SURVEY.md §3.2: replaces the reference's numpy LSTM
step (ref: JLM:decoder/ model file) and the XLA scan of
:func:`jlm_tpu.models.lstm.forward_hidden` for the time dimension.

Why a kernel: an XLA ``lax.scan`` re-reads the ``[E+H, 4H]`` weight matrix
from HBM every step (6.3 MB at H=512 — tens of µs of HBM bandwidth per
step).  Here the grid walks time blocks, weights are loaded into VMEM ONCE
(constant index_map → Mosaic keeps the block resident), the (c, h) carry
lives in VMEM scratch across grid steps (the "overlap-save halo" hand-off
of SURVEY.md §7 within one chip), and each step fuses both gate matmuls +
all elementwise gate math in one pass.

Gate order i, j, f, o; ``c' = σ(f+fb)·c + σ(i)·tanh(j)``,
``h' = σ(o)·tanh(c')`` — identical numerics to the oracle (§4.2).

``lstm_scan`` carries a custom VJP whose backward runs the jnp reference
(XLA scan) — training gradients stay exact while the forward-only hot
paths (PPL eval, decode priming, streaming scoring) get the fused kernel.
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


def _lstm_block_kernel(
    x_ref,  # [B, TB, E] embedded inputs for this time block
    wx_ref,  # [E, 4H] input->gates weights (VMEM-resident)
    wh_ref,  # [H, 4H] hidden->gates weights (VMEM-resident)
    b_ref,  # [1, 4H]
    c0_ref,  # [B, H] initial cell state
    h0_ref,  # [B, H] initial hidden state
    hs_ref,  # out [B, TB, H]
    c_out_ref,  # out [B, H] final cell state
    h_out_ref,  # out [B, H] final hidden state
    c_ref,  # scratch [B, H] carry
    h_ref,  # scratch [B, H] carry
    *,
    tb: int,
    hidden: int,
    forget_bias: float,
    compute_dtype,
):
    t_blk = pl.program_id(0)

    @pl.when(t_blk == 0)
    def _init():
        c_ref[:] = c0_ref[:]
        h_ref[:] = h0_ref[:]

    H = hidden

    def step(t, _):
        x_t = x_ref[:, t, :]
        z = (
            jnp.dot(
                x_t.astype(compute_dtype),
                wx_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                h_ref[:].astype(compute_dtype),
                wh_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b_ref[0, :][None, :]
        )
        i = z[:, 0:H]
        j = z[:, H : 2 * H]
        f = z[:, 2 * H : 3 * H]
        o = z[:, 3 * H : 4 * H]
        c = jax.nn.sigmoid(f + forget_bias) * c_ref[:] + jax.nn.sigmoid(
            i
        ) * jnp.tanh(j)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        hs_ref[:, t, :] = h
        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(t_blk == pl.num_programs(0) - 1)
    def _emit():
        c_out_ref[:] = c_ref[:]
        h_out_ref[:] = h_ref[:]


def _lstm_scan_fwd_impl(
    xs: jnp.ndarray,  # [B, T, E]
    W: jnp.ndarray,  # [E+H, 4H] fused weights
    b: jnp.ndarray,  # [4H]
    c0: jnp.ndarray,  # [B, H] initial cell state
    h0: jnp.ndarray,  # [B, H] initial hidden state
    *,
    forget_bias: float,
    time_block: int,
    compute_dtype,
    interpret: bool,
):
    B, T, E = xs.shape
    H = h0.shape[-1]
    TB = min(time_block, T)
    assert T % TB == 0, f"T={T} must divide by time_block={TB}"
    wx, wh = W[:E], W[E:]

    hs, c_f, h_f = pl.pallas_call(
        functools.partial(
            _lstm_block_kernel,
            tb=TB,
            hidden=H,
            forget_bias=forget_bias,
            compute_dtype=compute_dtype,
        ),
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((B, TB, E), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, TB, H), lambda t: (0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (E + H) * 4 * H,
            bytes_accessed=(E + H) * 4 * H * 4 + B * T * (E + H) * 4,
            transcendentals=5 * B * T * H,
        ),
        interpret=interpret,
    )(xs, wx, wh, b.reshape(1, -1), c0, h0)
    return hs, c_f, h_f


def lstm_scan_ref(xs, W, b, c0, h0, forget_bias: float = 1.0):
    """jnp reference (XLA scan) — also the backward path of the kernel."""
    H = h0.shape[-1]

    def step(carry, x_t):
        c, h = carry
        z = jnp.concatenate([x_t, h], axis=-1) @ W + b
        i, j, f, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (c, h), h

    (c_f, h_f), hs = jax.lax.scan(step, (c0, h0), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(hs, 0, 1), c_f, h_f


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def lstm_scan(
    xs, W, b, c0, h0,
    forget_bias: float = 1.0,
    time_block: int = 32,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Fused LSTM over ``[B, T, E]`` → ``(hs [B,T,H], c_T, h_T)``."""
    return _lstm_scan_fwd_impl(
        xs, W, b, c0, h0,
        forget_bias=forget_bias,
        time_block=time_block,
        compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _fwd(xs, W, b, c0, h0, forget_bias, time_block, compute_dtype, interpret):
    out = lstm_scan(
        xs, W, b, c0, h0, forget_bias, time_block, compute_dtype, interpret
    )
    return out, (xs, W, b, c0, h0)


def _bwd(forget_bias, time_block, compute_dtype, interpret, res, g):
    xs, W, b, c0, h0 = res
    _, vjp = jax.vjp(
        lambda xs, W, b, c0, h0: lstm_scan_ref(xs, W, b, c0, h0, forget_bias),
        xs, W, b, c0, h0,
    )
    return vjp(g)


lstm_scan.defvjp(_fwd, _bwd)
