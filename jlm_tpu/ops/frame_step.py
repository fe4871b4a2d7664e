"""Pallas TPU kernel: fused LSTM cell + per-sentence candidate scoring.

Round-4 decode-frame fusion (VERDICT r3 #1): the frame step previously ran
THREE Pallas calls — LSTM cell (``ops/lstm_cell.py``), per-sentence
candidate dots (``ops/cand_dot.py``), and the vocab-tiled logsumexp
(``ops/project.py``).  The candidate logits consume exactly the hidden
state the cell just produced, so this kernel computes both in one pass:
``h'`` never round-trips through HBM between the cell and the candidate
scoring, and one dispatch replaces two.  The frame is now two kernels:
this row-parallel one plus the vocab-parallel lse sweep (which needs a
different grid shape — huge row tiles to amortize head-weight streaming —
and therefore stays separate; a single merged grid was measured worse in
round 3's tile studies because the resident LSTM weights + candidate
columns shrink the lse row tile and multiply the dominant head-weight HBM
traffic).

Grid: sentence groups of ``gs`` (rows ``gs*B``; the fused LSTM weight
``[(E+H), 4H]`` stays VMEM-resident across the grid).  Per step:

  1. one MXU matmul pair ``x@W_x + h@W_h`` → gates in VMEM (never HBM),
  2. the element-wise cell (i, j, f, o order — matches
     :func:`jlm_tpu.models.lstm.lstm_step`),
  3. ``gs`` small candidate dots ``h'[s] [B, H] @ cols[s].T [H, C1]``
     against the pre-gathered candidate columns (the ``prepare``-hook
     payload), reading ``h'`` straight from registers/VMEM.

Decode-only (no VJP); training keeps :mod:`jlm_tpu.ops.lstm_scan`.
Ref: JLM:decoder/ model file's fused ``[x;h]·W`` cell + per-frame
candidate scoring (SURVEY.md §4.2, §4.6).
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


def _cell_cand_kernel(
    x_ref,  # [gs*B, E] compute dtype
    h_ref,  # [gs*B, H] compute dtype
    c_ref,  # [gs*B, H] fp32
    w_ref,  # [(E+H), 4H] compute dtype (VMEM-resident across grid)
    b_ref,  # [1, 4H] fp32
    cols_ref,  # [gs, C1, H] compute dtype
    cbias_ref,  # [gs, C1] fp32
    c_out_ref,  # [gs*B, H] fp32
    h_out_ref,  # [gs*B, H] compute dtype
    cand_out_ref,  # [gs, B, C1] fp32
    *,
    E: int,
    H: int,
    B: int,
    gs: int,
    forget_bias: float,
    compute_dtype,
):
    z = (
        jnp.dot(x_ref[:], w_ref[:E, :], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], w_ref[E:, :], preferred_element_type=jnp.float32)
        + b_ref[0, :][None, :]
    )  # [gs*B, 4H] fp32, VMEM only
    i = z[:, :H]
    j = z[:, H : 2 * H]
    f = z[:, 2 * H : 3 * H]
    o = z[:, 3 * H :]
    c_new = (
        jax.nn.sigmoid(f + forget_bias) * c_ref[:]
        + jax.nn.sigmoid(i) * jnp.tanh(j)
    )
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)  # [gs*B, H] fp32
    c_out_ref[:] = c_new
    h_out_ref[:] = h_new.astype(h_out_ref.dtype)

    hc = h_new.astype(compute_dtype)
    for s in range(gs):
        # [B, H] x [C1, H]^T — tiny per-sentence dot, but h' and the
        # candidate columns are already VMEM-resident so the only cost is
        # MXU issue (same unroll shape ops/cand_dot.py measured at
        # 0.67 ms/frame standalone; here the separate dispatch and the h3
        # HBM round trip disappear).
        cand_out_ref[s] = (
            jax.lax.dot_general(
                hc[s * B : (s + 1) * B],
                cols_ref[s],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + cbias_ref[s][None, :]
        )


def cell_cand_step(
    x: jnp.ndarray,  # [R, E] (R = S*B, sentence-major beam rows)
    h: jnp.ndarray,  # [R, H]
    c: jnp.ndarray,  # [R, H]
    W: jnp.ndarray,  # [(E+H), 4H]
    b: jnp.ndarray,  # [4H]
    cols: jnp.ndarray,  # [S, C1, H] candidate columns (prepare payload)
    cbias: jnp.ndarray,  # [S, C1] fp32
    B: int,
    forget_bias: float = 1.0,
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused decode-frame row step: ``(c', h', cand_logits)``.

    ``cand_logits [S, B, C1]`` are the raw (un-normalized) candidate
    logits with bias added; the caller subtracts the lse-kernel output.
    """
    R, E = x.shape
    H = h.shape[1]
    S, C1, _ = cols.shape
    assert R == S * B, (R, S, B)
    x = x.astype(compute_dtype)
    h = h.astype(compute_dtype)
    W = W.astype(compute_dtype)
    cols = cols.astype(compute_dtype)
    cd = jnp.dtype(compute_dtype).itemsize

    # Sentence-group size: largest that fits ~10 MB VMEM (Mosaic needs
    # headroom beyond this to double-buffer the streams — round-3 rule)
    # next to the resident fused weight, with gs*B rows a multiple of 8.
    w_bytes = (E + H) * 4 * H * cd + 4 * H * 4
    budget = 10 * 1024 * 1024 - w_bytes
    gs = None
    for gs_try in (64, 48, 32, 24, 16, 8, 4, 2, 1):
        if gs_try * B % 8 or gs_try > _round_up(S, gs_try):
            continue
        rows = gs_try * B
        need = (
            2 * rows * (E + H) * cd  # x + h in (double-buffered)
            + 2 * rows * H * 4  # c in
            + 2 * gs_try * C1 * (H * cd + 4)  # cols + cbias
            + 3 * rows * 4 * H * 4  # z + gate temporaries (fp32)
            + 2 * rows * H * (4 + cd)  # c' + h' out
            + 2 * gs_try * B * C1 * 4  # cand out
        )
        if need <= budget:
            gs = gs_try
            break
    if gs is None:
        gs = 1
    S_pad = _round_up(S, gs)
    if S_pad != S:
        pad_r = (S_pad - S) * B
        x = jnp.pad(x, ((0, pad_r), (0, 0)))
        h = jnp.pad(h, ((0, pad_r), (0, 0)))
        c = jnp.pad(c, ((0, pad_r), (0, 0)))
        cols = jnp.pad(cols, ((0, S_pad - S), (0, 0), (0, 0)))
        cbias = jnp.pad(cbias, ((0, S_pad - S), (0, 0)))
    rows = gs * B

    c_new, h_new, cand = pl.pallas_call(
        functools.partial(
            _cell_cand_kernel, E=E, H=H, B=B, gs=gs,
            forget_bias=float(forget_bias), compute_dtype=compute_dtype,
        ),
        grid=(S_pad // gs,),
        in_specs=[
            pl.BlockSpec((rows, E), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E + H, 4 * H), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, C1, H), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, C1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, H), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs, B, C1), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S_pad * B, H), jnp.float32),
            jax.ShapeDtypeStruct((S_pad * B, H), compute_dtype),
            jax.ShapeDtypeStruct((S_pad, B, C1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * S_pad * B * ((E + H) * 4 * H + C1 * H),
            bytes_accessed=S_pad * B * ((E + 2 * H) * cd + 3 * H * 4)
            + S_pad * C1 * H * cd,
            transcendentals=5 * S_pad * B * H,
        ),
        interpret=interpret,
    )(
        x, h, c.astype(jnp.float32), W,
        b.reshape(1, -1).astype(jnp.float32),
        cols, cbias.astype(jnp.float32),
    )
    return c_new[:R], h_new[:R], cand[:S]


def cell_cand_ref(x, h, c, W, b, cols, cbias, B, forget_bias=1.0):
    """jnp reference (cell ref + the engine's einsum candidate scoring)."""
    from jlm_tpu.ops.lstm_cell import lstm_cell_ref

    c_new, h_new = lstm_cell_ref(x, h, c, W, b, forget_bias)
    S = cols.shape[0]
    h3 = h_new.reshape(S, B, -1)
    cand = (
        jnp.einsum("sbh,sch->sbc", h3.astype(jnp.float32),
                   cols.astype(jnp.float32))
        + cbias.astype(jnp.float32)[:, None, :]
    )
    return c_new, h_new, cand
