"""Pallas TPU kernel: fused softmax cross-entropy over a huge vocabulary.

Training-side sibling of :mod:`jlm_tpu.ops.project` (SURVEY.md §3.2 kernel
#2).  XLA's full-CE loss materializes the ``[B·T, V]`` logits in HBM twice
(forward write, backward read) — 400 MB at B·T=2048, V=50k fp32 and
800 MB at the config-5 100k head — which caps batch size and burns HBM
bandwidth.  This kernel keeps logits in VMEM tiles end to end:

- forward: grid (row blocks, vocab tiles), online logsumexp in the output
  accumulators + the target logit extracted in-tile by an iota==target
  mask; ``loss = lse - logit_target``.
- backward: recomputes tile logits from (h, W) — cheaper than 2x 400 MB
  of HBM — in TWO kernels with opposite grid nesting, because each output
  accumulates over a different grid axis and Pallas output blocks may only
  be revisited on consecutive grid steps:
    K1 (rows outer, vocab minor):  dh = (g·p) @ Wᵀ  accumulated in VMEM
       scratch across the vocab sweep (p = softmax from the saved lse);
    K2 (vocab outer, rows minor):  dW[:, tile] = hᵀ @ (g·p),
       db[tile] = Σ_rows (g·p), accumulated across the row sweep in the
       resident output block.
  The onehot(target) correction folds into g·p in both kernels.

Supports fp32/bf16 weights and int8 quant dicts (in-kernel dequant), same
as the decode projection.  Exact-math custom VJP; grads tolerance-tested
against the jnp reference in tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_CHUNK_V = 256  # fp32 logits materialize this many columns at a time


def _pick_tiles(B, D, V, itemsize, tile_v, kind):
    """Per-KERNEL (tile_r, tile_v) under a 12 MB scoped-VMEM budget.

    The three CE kernels have different working sets, so sharing one tile
    choice (r3's first cut) forced the smallest-common tile and doubled
    weight re-streaming at the 100k head (measured: fused CE regressed
    from 34.8 to 41.5 ms/step).  ``itemsize`` is the compute dtype's (the
    wrapper pre-casts W and h, so bf16 training streams half the bytes):

    - ``fwd``/``dh`` re-stream the whole weight matrix once per ROW sweep
      -> maximize tile_r first;
    - ``dw`` (vocab-outer grid) streams W once but re-reads the h rows
      once per VOCAB sweep -> maximize tile_v first.
    """
    budget = 12 * 1024 * 1024
    trs = (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
    tvs = (2048, 1024, 512, 256)

    def need(tr, tv):
        ck = min(_CHUNK_V, tv)
        n = (
            2 * D * tv * itemsize  # double-buffered W tile
            + 6 * tv * 4  # scale + bias tiles
            + 2 * tr * D * itemsize  # h block, double-buffered
            + 2 * tr * ck * 4  # logits chunk + temp
            # each UNROLLED chunk iteration keeps its own live logits/exp
            # temporaries on the Mosaic stack (r4: a d=128 D-softmax block
            # at tr=1024, tv=2048 = 8 unrolled chunks measured 16.15 MB
            # scoped — 2x this model without the term)
            + (tv // ck - 1) * tr * ck * 4
        )
        if kind == "fwd":
            n += 8 * tr * 128 * 4  # y in + m/s/t out, double-buffered
        elif kind == "dh":
            n += 6 * tr * 128 * 4 + 2 * tr * D * 4  # y/g/lse + dh out
        else:  # dw
            n += 6 * tr * 128 * 4 + 2 * D * tv * 4 + 4 * tv * 4
        return n

    outer, inner = (trs, tvs) if kind in ("fwd", "dh") else (tvs, trs)
    for a in outer:
        for b in inner:
            tr, tv = (a, b) if kind in ("fwd", "dh") else (b, a)
            if tr > _round_up(B, 8) and tr > 8:
                continue
            tvc = min(tv, _round_up(V, 128))
            if need(tr, tvc) <= budget:
                return tr, tvc
    return 8, 256


def _tile_logits(h_ref, w_ref, scale_ref, b_ref, compute_dtype, quantized):
    if quantized:
        w = (w_ref[:].astype(jnp.float32) * scale_ref[0, :][None, :]).astype(
            compute_dtype
        )
    else:
        w = w_ref[:].astype(compute_dtype)
    return (
        jnp.dot(h_ref[:].astype(compute_dtype), w,
                preferred_element_type=jnp.float32)
        + b_ref[0, :][None, :]
    )


def _ce_fwd_kernel(
    y_ref,  # int32 [TR, 128] targets (col 0)
    h_ref,  # fp [TR, D]
    w_ref,  # [D, TV]
    scale_ref,  # fp32 [1, TV]
    b_ref,  # fp32 [1, TV]
    m_out_ref,  # fp32 [TR, 128] running max (col 0)
    s_out_ref,  # fp32 [TR, 128] running sumexp (col 0)
    t_out_ref,  # fp32 [TR, 128] target logit (col 0)
    *,
    tile_v: int,
    compute_dtype,
    quantized: bool,
):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_out_ref[:] = jnp.full_like(m_out_ref, -1e30)
        s_out_ref[:] = jnp.zeros_like(s_out_ref)
        t_out_ref[:] = jnp.zeros_like(t_out_ref)

    m_run = m_out_ref[:, :1]
    s_run = s_out_ref[:, :1]
    t_run = t_out_ref[:, :1]
    for c0 in range(0, tile_v, min(_CHUNK_V, tile_v)):
        ck = min(_CHUNK_V, tile_v)
        logits = _tile_logits(h_ref, w_ref.at[:, c0:c0 + ck],
                              scale_ref.at[:, c0:c0 + ck],
                              b_ref.at[:, c0:c0 + ck],
                              compute_dtype, quantized)
        m_new = jnp.maximum(m_run, jnp.max(logits, axis=1, keepdims=True))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True
        )
        m_run = m_new
        col = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
               + v * tile_v + c0)
        hit = col == y_ref[:, :1]
        t_run = t_run + jnp.sum(jnp.where(hit, logits, 0.0), axis=1,
                                keepdims=True)
    m_out_ref[:, :1] = m_run
    s_out_ref[:, :1] = s_run
    t_out_ref[:, :1] = t_run


def _ce_bwd_dh_kernel(
    y_ref, ga_ref, gb_ref, lse_ref,  # [TR, 128] (col 0)
    h_ref,  # [TR, D]
    w_ref, scale_ref, b_ref,
    dh_out_ref,  # fp32 [TR, D]
    *,
    tile_v: int,
    compute_dtype,
    quantized: bool,
):
    # grid (row blocks, vocab tiles): dh accumulates across the vocab sweep
    # in the resident output block (consecutive revisits only).
    #
    # Generalized cotangent form ``gp = ga·p + gb·onehot(target)``: the
    # plain CE vjp is (ga, gb) = (g, −g); the vocab-/block-PARTIAL vjp
    # (sharded_head._vocab_parallel_nll_pallas) needs independent
    # coefficients because the softmax-path and target-path cotangents
    # arrive separately through the collective merge.
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        dh_out_ref[:] = jnp.zeros_like(dh_out_ref)

    acc = dh_out_ref[:]
    for c0 in range(0, tile_v, min(_CHUNK_V, tile_v)):
        ck = min(_CHUNK_V, tile_v)
        logits = _tile_logits(h_ref, w_ref.at[:, c0:c0 + ck],
                              scale_ref.at[:, c0:c0 + ck],
                              b_ref.at[:, c0:c0 + ck],
                              compute_dtype, quantized)
        p = jnp.exp(logits - lse_ref[:, :1])
        col = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
               + v * tile_v + c0)
        gp = ga_ref[:, :1] * p + gb_ref[:, :1] * (
            col == y_ref[:, :1]
        ).astype(jnp.float32)
        if quantized:
            w = (w_ref[:, c0:c0 + ck].astype(jnp.float32)
                 * scale_ref[0, c0:c0 + ck][None, :]).astype(compute_dtype)
        else:
            w = w_ref[:, c0:c0 + ck].astype(compute_dtype)
        acc = acc + jax.lax.dot_general(
            gp.astype(compute_dtype), w,
            (((1,), (1,)), ((), ())),  # gp @ w^T
            preferred_element_type=jnp.float32,
        )
    dh_out_ref[:] = acc


def _ce_bwd_dw_kernel(
    y_ref, ga_ref, gb_ref, lse_ref,  # [TR, 128] (col 0)
    h_ref,  # [TR, D]
    w_ref, scale_ref, b_ref,
    dw_out_ref,  # fp32 [D, TV]
    db_out_ref,  # fp32 [1, TV]
    *,
    tile_v: int,
    compute_dtype,
    quantized: bool,
):
    # grid (vocab tiles, row blocks): dW/db accumulate across the row sweep.
    # Same generalized ``gp = ga·p + gb·onehot`` form as the dh kernel.
    v, r = pl.program_id(0), pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        dw_out_ref[:] = jnp.zeros_like(dw_out_ref)
        db_out_ref[:] = jnp.zeros_like(db_out_ref)

    for c0 in range(0, tile_v, min(_CHUNK_V, tile_v)):
        ck = min(_CHUNK_V, tile_v)
        logits = _tile_logits(h_ref, w_ref.at[:, c0:c0 + ck],
                              scale_ref.at[:, c0:c0 + ck],
                              b_ref.at[:, c0:c0 + ck],
                              compute_dtype, quantized)
        p = jnp.exp(logits - lse_ref[:, :1])
        col = (jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
               + v * tile_v + c0)
        gp = ga_ref[:, :1] * p + gb_ref[:, :1] * (
            col == y_ref[:, :1]
        ).astype(jnp.float32)
        dw_out_ref[:, c0:c0 + ck] += jax.lax.dot_general(
            h_ref[:].astype(compute_dtype), gp.astype(compute_dtype),
            (((0,), (0,)), ((), ())),  # h^T @ gp
            preferred_element_type=jnp.float32,
        )
        db_out_ref[:, c0:c0 + ck] += jnp.sum(gp, axis=0, keepdims=True)


def _prep(h, weight, scale, bias, targets, tile_v, compute_dtype, kind):
    B, D = h.shape
    V = weight.shape[1]
    quantized_in = scale is not None
    if not quantized_in:
        # Pre-cast W and h to the compute dtype: the kernels' matmuls ran
        # in compute_dtype anyway (per-chunk VPU casts), so this only
        # halves the HBM streaming in bf16 training.
        weight = weight.astype(compute_dtype)
    h = h.astype(compute_dtype)
    tr, tv = _pick_tiles(B, D, V, jnp.dtype(compute_dtype).itemsize, tile_v,
                         kind)
    tr = min(tr, _round_up(B, 8))
    V_pad = _round_up(V, tv)
    B_pad = _round_up(B, tr)
    if B_pad != B:
        h = jnp.pad(h, ((0, B_pad - B), (0, 0)))
        targets = jnp.pad(targets, (0, B_pad - B))
    if V_pad != V:
        weight = jnp.pad(weight, ((0, 0), (0, V_pad - V)))
        bias = jnp.pad(bias, (0, V_pad - V), constant_values=-1e30)
        if scale is not None:
            scale = jnp.pad(scale, (0, V_pad - V))
    quantized = scale is not None
    if scale is None:
        scale = jnp.ones((V_pad,), jnp.float32)
    y2 = jnp.zeros((B_pad, 128), jnp.int32).at[:, 0].set(
        targets.astype(jnp.int32)
    )
    return (h, weight, scale.reshape(1, -1).astype(jnp.float32),
            bias.reshape(1, -1).astype(jnp.float32), y2, tr, tv, B_pad, V_pad,
            quantized)


def _ce_fwd_raw(h, weight, scale, bias, targets, *, tile_v, compute_dtype,
                interpret):
    """Per-row partial CE triple ``(m, s, t)``: running max, sumexp
    (relative to m), and the target logit (0 when ``targets`` is out of
    range, e.g. -1 for "this block doesn't own the target") — the
    D-softmax per-block form; the full-head loss is the single-block
    merge."""
    B = h.shape[0]
    (hp, wp, sp, bp, y2, tr, tv, B_pad, V_pad, quantized) = _prep(
        h, weight, scale, bias, targets, tile_v, compute_dtype, "fwd"
    )
    D = hp.shape[1]
    m, s, t = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, tile_v=tv,
                          compute_dtype=compute_dtype, quantized=quantized),
        grid=(B_pad // tr, V_pad // tv),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, D), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B_pad, 128), jnp.float32) for _ in range(3)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * D * V_pad,
            bytes_accessed=(B_pad // tr) * D * V_pad * weight.dtype.itemsize
            + B_pad * D * 4,
            transcendentals=B_pad * V_pad,
        ),
        interpret=interpret,
    )(y2, hp, wp, sp, bp)
    return m[:B, 0], s[:B, 0], t[:B, 0]


def _ce_fwd_impl(h, weight, scale, bias, targets, *, tile_v, compute_dtype,
                 interpret):
    m, s, t = _ce_fwd_raw(
        h, weight, scale, bias, targets,
        tile_v=tile_v, compute_dtype=compute_dtype, interpret=interpret,
    )
    lse = m + jnp.log(s)
    return lse - t, lse


def _ce_bwd_impl(h, weight, scale, bias, targets, lse, g, gb=None, *, tile_v,
                 compute_dtype, interpret):
    """Backward kernels with cotangent ``gp = g·p + gb·onehot(target)``.

    ``gb=None`` means the plain-CE form ``gb = −g``; the vocab-/block-
    partial vjp passes independent coefficients (see the dh kernel note).
    """
    if gb is None:
        gb = -g
    B = h.shape[0]
    (hp, wp, sp, bp, y2, tr, tv, B_pad, V_pad, quantized) = _prep(
        h, weight, scale, bias, targets, tile_v, compute_dtype, "dh"
    )
    D = hp.shape[1]
    aux = jnp.zeros((B_pad, 128), jnp.float32)
    g2 = aux.at[:B, 0].set(g)
    gb2 = aux.at[:B, 0].set(gb)
    lse2 = aux.at[:B, 0].set(lse)

    dh = pl.pallas_call(
        functools.partial(_ce_bwd_dh_kernel, tile_v=tv,
                          compute_dtype=compute_dtype, quantized=quantized),
        grid=(B_pad // tr, V_pad // tv),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, D), lambda r, v: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda r, v: (0, v), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, D), lambda r, v: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, D), jnp.float32),
        interpret=interpret,
    )(y2, g2, gb2, lse2, hp, wp, sp, bp)

    (hp, wp, sp, bp, y2, tr, tv, B_pad, V_pad, quantized) = _prep(
        h, weight, scale, bias, targets, tile_v, compute_dtype, "dw"
    )
    aux = jnp.zeros((B_pad, 128), jnp.float32)
    g2 = aux.at[:B, 0].set(g)
    gb2 = aux.at[:B, 0].set(gb)
    lse2 = aux.at[:B, 0].set(lse)
    dw, db = pl.pallas_call(
        functools.partial(_ce_bwd_dw_kernel, tile_v=tv,
                          compute_dtype=compute_dtype, quantized=quantized),
        grid=(V_pad // tv, B_pad // tr),
        in_specs=[
            pl.BlockSpec((tr, 128), lambda v, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda v, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda v, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 128), lambda v, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, D), lambda v, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tv), lambda v, r: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda v, r: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda v, r: (0, v), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D, tv), lambda v, r: (0, v), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tv), lambda v, r: (0, v), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, V_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, V_pad), jnp.float32),
        ),
        interpret=interpret,
    )(y2, g2, gb2, lse2, hp, wp, sp, bp)

    V = bias.shape[-1]
    return dh[:B], dw[:, :V], db[0, :V]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def ce_loss_fused(
    h,  # [B, D] fp32
    weight,  # [D, V] fp32/bf16 (int8 dicts: quantized weights don't train)
    bias,  # [V] fp32
    targets,  # [B] int32
    tile_v: int = 2048,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    scale=None,  # static None for trainable paths
):
    """Per-row CE loss ``[B]`` without materializing logits in HBM."""
    loss, _ = _ce_fwd_impl(
        h, weight, scale, bias, targets,
        tile_v=tile_v, compute_dtype=compute_dtype, interpret=interpret,
    )
    return loss


def _vjp_fwd(h, weight, bias, targets, tile_v, compute_dtype, interpret,
             scale):
    loss, lse = _ce_fwd_impl(
        h, weight, scale, bias, targets,
        tile_v=tile_v, compute_dtype=compute_dtype, interpret=interpret,
    )
    return loss, (h, weight, bias, targets, lse)


def _vjp_bwd(tile_v, compute_dtype, interpret, scale, res, g):
    h, weight, bias, targets, lse = res
    dh, dw, db = _ce_bwd_impl(
        h, weight, scale, bias, targets, lse, g,
        tile_v=tile_v, compute_dtype=compute_dtype, interpret=interpret,
    )
    return dh, dw.astype(weight.dtype), db.astype(bias.dtype), None


ce_loss_fused.defvjp(_vjp_fwd, _vjp_bwd)


def ce_loss_ref(h, weight, bias, targets):
    """jnp reference for tests."""
    logits = (h @ weight.astype(jnp.float32) + bias).astype(jnp.float32)
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
    tgt = jnp.take_along_axis(logits, targets[:, None], axis=1)
    return (lse - tgt)[:, 0]


# ---------------------------------------------------------------------------
# D-softmax fused CE: one kernel call per frequency block, merged lse
# ---------------------------------------------------------------------------

def _ds_slices(block_dims, mode):
    """(start, dim) hidden-slice per block for prefix/disjoint modes."""
    out = []
    offset = 0
    for d in block_dims:
        if mode == "prefix":
            out.append((0, d))
        else:
            out.append((offset, d))
            offset += d
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def ce_loss_fused_dsoftmax(
    h,  # [B, H] fp32
    weights,  # tuple of [d_k, s_k] fp block weights
    biases,  # tuple of [s_k] fp32
    targets,  # [B] int32
    block_sizes: Tuple[int, ...] = (),
    block_dims: Tuple[int, ...] = (),
    mode: str = "prefix",
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Per-row CE loss ``[B]`` for the D-softmax head, logits never in HBM.

    VERDICT r3 #7: the fused-CE kernel previously covered only the full
    head — config-5 training (2-layer, 100k D-softmax head), exactly where
    the 800 MB logits buffer hurts most, fell back to XLA CE.  Block k
    projects only its hidden slice (the D-softmax FLOP saving) through the
    SAME tiled kernel; the per-block partial ``(m, s, t)`` triples merge
    with the three-line logsumexp the decode head uses
    (ops/project.py::project_candidates_dsoftmax).
    """
    loss, _ = _ds_fwd_impl(
        h, weights, biases, targets, block_sizes, block_dims, mode,
        compute_dtype, interpret,
    )
    return loss


def _ds_fwd_impl(h, weights, biases, targets, block_sizes, block_dims, mode,
                 compute_dtype, interpret):
    import numpy as np

    bases = np.concatenate([[0], np.cumsum(block_sizes)[:-1]]).astype(np.int64)
    ms, ss, ts = [], [], []
    for k, (start, d) in enumerate(_ds_slices(block_dims, mode)):
        hk = h[:, start:start + d]
        in_blk = (targets >= int(bases[k])) & (
            targets < int(bases[k]) + block_sizes[k]
        )
        local = jnp.where(in_blk, targets - int(bases[k]), -1)
        m, s, t = _ce_fwd_raw(
            hk, weights[k], None, biases[k], local,
            tile_v=2048, compute_dtype=compute_dtype, interpret=interpret,
        )
        ms.append(m)
        ss.append(s)
        ts.append(t)
    m_all = jnp.stack(ms, axis=1)  # [B, K]
    s_all = jnp.stack(ss, axis=1)
    m_g = jnp.max(m_all, axis=1)
    s_g = jnp.sum(s_all * jnp.exp(m_all - m_g[:, None]), axis=1)
    lse = m_g + jnp.log(s_g)
    tgt = sum(ts)
    return lse - tgt, lse


def _ds_vjp_fwd(h, weights, biases, targets, block_sizes, block_dims, mode,
                compute_dtype, interpret):
    loss, lse = _ds_fwd_impl(
        h, weights, biases, targets, block_sizes, block_dims, mode,
        compute_dtype, interpret,
    )
    return loss, (h, weights, biases, targets, lse)


def _ds_vjp_bwd(block_sizes, block_dims, mode, compute_dtype, interpret,
                res, g):
    import numpy as np

    h, weights, biases, targets, lse = res
    bases = np.concatenate([[0], np.cumsum(block_sizes)[:-1]]).astype(np.int64)
    # accumulate dh in fp32 (the per-block kernels emit fp32; scatter-adds
    # into a bf16 buffer hit jax's slow dtype-promotion path + deprecation
    # warning) and cast once at the end
    dh = jnp.zeros(h.shape, jnp.float32)
    dws, dbs = [], []
    for k, (start, d) in enumerate(_ds_slices(block_dims, mode)):
        hk = h[:, start:start + d]
        in_blk = (targets >= int(bases[k])) & (
            targets < int(bases[k]) + block_sizes[k]
        )
        local = jnp.where(in_blk, targets - int(bases[k]), -1)
        dh_k, dw_k, db_k = _ce_bwd_impl(
            hk, weights[k], None, biases[k], local, lse, g,
            tile_v=2048, compute_dtype=compute_dtype, interpret=interpret,
        )
        dh = dh.at[:, start:start + d].add(dh_k)
        dws.append(dw_k.astype(weights[k].dtype))
        dbs.append(db_k.astype(biases[k].dtype))
    return dh.astype(h.dtype), tuple(dws), tuple(dbs), None


ce_loss_fused_dsoftmax.defvjp(_ds_vjp_fwd, _ds_vjp_bwd)
