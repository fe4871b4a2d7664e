"""Pallas TPU kernel: per-sentence candidate-column scoring.

The decode frame's candidate logits are a batched SMALL matmul — per
sentence ``h[s] [B=10, H] @ cols[s].T [H, C1=65]`` — which XLA lowers
poorly on TPU (measured 0.77 ms/frame at S=512 for 0.34 GFLOP ≈ 0.4
TFLOP/s: each batch element underfills the MXU and the batched-matmul
loop adds per-element overhead).  This kernel tiles SENTENCES into the
grid and unrolls a few per-cell dots so the whole sweep runs out of VMEM
with one DMA stream per operand.

Used by the decode engine's speed path (the ``prepare``-hook candidate
scoring — SURVEY.md §3.2 kernel #3's batched form); the jnp einsum
remains the reference (`cand_dot_ref`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _cand_kernel(h_ref, cols_ref, bias_ref, out_ref, *, gs: int):
    # h_ref [gs, B, H]; cols_ref [gs, C1, H]; bias_ref [gs, C1];
    # out_ref [gs, B, C1].  Unrolled per-sentence dots: [B, H] x [C1, H]^T
    # — B and C1 are tiny, but the operands are already VMEM-resident so
    # the only cost is MXU issue.
    for i in range(gs):
        out_ref[i] = (
            jax.lax.dot_general(
                h_ref[i],
                cols_ref[i],
                (((1,), (1,)), ((), ())),  # contract H with H
                preferred_element_type=jnp.float32,
            )
            + bias_ref[i][None, :]
        )


def cand_dot(
    h3: jnp.ndarray,  # [S, B, H] compute dtype
    cols: jnp.ndarray,  # [S, C1, H] compute dtype
    bias: jnp.ndarray,  # [S, C1] fp32
    *,
    gs: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-sentence candidate logits ``[S, B, C1]`` fp32 (bias added)."""
    S, B, H = h3.shape
    C1 = cols.shape[1]
    S_pad = _round_up(S, gs)
    if S_pad != S:
        pad = ((0, S_pad - S), (0, 0), (0, 0))
        h3 = jnp.pad(h3, pad)
        cols = jnp.pad(cols, pad)
        bias = jnp.pad(bias, ((0, S_pad - S), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_cand_kernel, gs=gs),
        grid=(S_pad // gs,),
        in_specs=[
            pl.BlockSpec((gs, B, H), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, C1, H), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, C1), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gs, B, C1), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, B, C1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * B * C1 * H,
            bytes_accessed=(
                S_pad * (B + C1) * H * h3.dtype.itemsize
                + S_pad * B * C1 * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(h3, cols, bias.astype(jnp.float32))
    return out[:S]


def cand_dot_ref(h3, cols, bias):
    """jnp reference (the engine's previous einsum formulation)."""
    return (
        jnp.einsum(
            "sbh,sch->sbc",
            h3.astype(jnp.float32),
            cols.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        + bias.astype(jnp.float32)[:, None, :]
    )
