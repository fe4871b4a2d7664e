"""Sequence (time-block) pipeline parallelism for the LSTM scan.

The reference has no sequence parallelism and no attention, so
ring-attention/Ulysses have no referent (SURVEY.md §7 "Long-context");
the recurrent analogue promised there is implemented here: the BPTT
window's time axis is sharded over a ``seq`` mesh axis, device ``p`` owns
time block ``p``, and the per-layer (c, h) carries are handed to the right
neighbor via ``ppermute`` — the overlap-save halo across chips.

Because the recurrence is sequential, parallelism comes from PIPELINING a
stream of M microbatches (GPipe-style over time): in round ``r`` device
``p`` processes microbatch ``r − p``; after ``M + P − 1`` rounds every
microbatch has flowed through every time block.  Device utilization is
``M / (M + P − 1)``.

This doubles as the build's pipeline-parallel (pp) dimension: stages are
time blocks instead of layers, the natural cut for a 1-2 layer LSTM whose
few layers can't amortize a layer pipeline but whose time axis is long.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

SEQ_AXIS = "seq"


def _cell_stack(layers, forget_bias, x_t, c, h):
    """One multi-layer fused-cell step; c,h [L,B,H]."""
    new_c, new_h = [], []
    x = x_t
    for l, (W, b) in enumerate(layers):
        z = jnp.concatenate([x, h[l]], axis=-1) @ W + b
        i, j, f, o = jnp.split(z, 4, axis=-1)
        cl = jax.nn.sigmoid(f + forget_bias) * c[l] + jax.nn.sigmoid(i) * jnp.tanh(j)
        hl = jax.nn.sigmoid(o) * jnp.tanh(cl)
        new_c.append(cl)
        new_h.append(hl)
        x = hl
    return jnp.stack(new_c), jnp.stack(new_h), x


def make_seq_pipeline_scan(
    mesh: jax.sharding.Mesh,
    num_layers: int = 1,
    forget_bias: float = 1.0,
):
    """Returns ``fn(xs [M,B,T,E], layers ((W,b),...), c0, h0 [M,L,B,H])
    -> (hs [M,B,T,H], c_T, h_T [M,L,B,H])`` with T sharded over ``seq``.

    Exactly equals a sequential scan over each microbatch (parity test);
    wall-clock scales ~P/(1 + (P−1)/M) over one device.
    """
    Pn = mesh.shape[SEQ_AXIS]
    layer_specs = tuple((P(), P()) for _ in range(num_layers))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, SEQ_AXIS, None), layer_specs, P(), P()),
        out_specs=(P(None, None, SEQ_AXIS, None), P(SEQ_AXIS), P(SEQ_AXIS)),
        check_vma=False,
    )
    def pipeline(xs_local, layers, c0, h0):
        # xs_local [M, B, TB, E]: this device's time block of every microbatch
        M, B, TB, E = xs_local.shape
        L, _, H = c0.shape[1:]
        p = jax.lax.axis_index(SEQ_AXIS)

        def block_scan(carry, x_t):
            c, h = carry
            c, h, top = _cell_stack(layers, forget_bias, x_t, c, h)
            return (c, h), top

        def round_fn(r, state):
            hs_acc, recv_c, recv_h, done_c, done_h = state
            m = r - p  # microbatch this device works on this round
            active = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            # stage-input carry: microbatch m's carry after block p-1;
            # device 0 uses the stream's initial state instead.
            cin = jnp.where(p == 0, c0[mc], recv_c)
            hin = jnp.where(p == 0, h0[mc], recv_h)
            (c_out, h_out), hs_blk = jax.lax.scan(
                block_scan, (cin, hin), jnp.moveaxis(xs_local[mc], 1, 0)
            )
            hs_blk = jnp.moveaxis(hs_blk, 0, 1)  # [B, TB, H]
            hs_acc = jnp.where(
                active,
                jax.lax.dynamic_update_index_in_dim(hs_acc, hs_blk, mc, 0),
                hs_acc,
            )
            is_last = p == Pn - 1
            done_c = jnp.where(
                active & is_last,
                jax.lax.dynamic_update_index_in_dim(done_c, c_out, mc, 0),
                done_c,
            )
            done_h = jnp.where(
                active & is_last,
                jax.lax.dynamic_update_index_in_dim(done_h, h_out, mc, 0),
                done_h,
            )
            # halo hand-off: send this round's carry to the right neighbor
            send_c = jnp.where(active, c_out, recv_c)
            send_h = jnp.where(active, h_out, recv_h)
            perm = [(i, i + 1) for i in range(Pn - 1)]
            recv_c = jax.lax.ppermute(send_c, SEQ_AXIS, perm)
            recv_h = jax.lax.ppermute(send_h, SEQ_AXIS, perm)
            return hs_acc, recv_c, recv_h, done_c, done_h

        hs_acc = jnp.zeros((M, B, TB, H), jnp.float32)
        zc = jnp.zeros((L, B, H), jnp.float32)
        state = (
            hs_acc, zc, zc,
            jnp.zeros((M, L, B, H)), jnp.zeros((M, L, B, H)),
        )
        hs_acc, _, _, done_c, done_h = jax.lax.fori_loop(
            0, M + Pn - 1, round_fn, state
        )
        # final carries live on the last stage only; broadcast via psum of
        # one-hot-owned values, then hand each shard its microbatch slice
        # (out_specs P(SEQ_AXIS); caller asserts M % Pn == 0).
        mine = (jax.lax.axis_index(SEQ_AXIS) == Pn - 1).astype(jnp.float32)
        done_c = jax.lax.psum(done_c * mine, SEQ_AXIS)
        done_h = jax.lax.psum(done_h * mine, SEQ_AXIS)
        sl = jax.lax.axis_index(SEQ_AXIS) * (done_c.shape[0] // Pn)
        return (
            hs_acc,
            jax.lax.dynamic_slice_in_dim(done_c, sl, done_c.shape[0] // Pn, 0),
            jax.lax.dynamic_slice_in_dim(done_h, sl, done_h.shape[0] // Pn, 0),
        )

    def fn(xs, layers, c0, h0):
        assert len(layers) == num_layers
        M = xs.shape[0]
        assert M % Pn == 0, (
            f"microbatch count {M} must divide seq axis {Pn} "
            "(carry output sharding)"
        )
        assert xs.shape[2] % Pn == 0, "T must divide over the seq axis"
        return pipeline(xs, tuple(tuple(l) for l in layers), c0, h0)

    return fn


def seq_pipeline_ref(xs, layers, c0, h0, forget_bias: float = 1.0):
    """Sequential reference: independent multi-layer scan per microbatch."""

    def one(x, c, h):
        def step(carry, x_t):
            c, h = carry
            c, h, top = _cell_stack(layers, forget_bias, x_t, c, h)
            return (c, h), top

        (c_f, h_f), hs = jax.lax.scan(step, (c, h), jnp.moveaxis(x, 1, 0))
        return jnp.moveaxis(hs, 0, 1), c_f, h_f

    return jax.vmap(one)(xs, c0, h0)
