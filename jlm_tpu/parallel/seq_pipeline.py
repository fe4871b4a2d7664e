"""Sequence (time-block) pipeline parallelism for the LSTM scan.

The reference has no sequence parallelism and no attention, so
ring-attention/Ulysses have no referent (SURVEY.md §7 "Long-context");
the recurrent analogue promised there is implemented here: the BPTT
window's time axis is sharded over a ``seq`` mesh axis, device ``p`` owns
time block ``p``, and the (c, h) carry is handed to the right neighbor via
``ppermute`` — the overlap-save halo across chips.

Because the recurrence is sequential, parallelism comes from PIPELINING a
stream of M microbatches (GPipe-style over time): in round ``r`` device
``p`` processes microbatch ``r − p``; after ``M + P − 1`` rounds every
microbatch has flowed through every time block.  Device utilization is
``M / (M + P − 1)``.

This doubles as the build's pipeline-parallel (pp) dimension: stages are
time blocks instead of layers, which is the natural cut for a 1-2 layer
LSTM where layers are too few to pipeline but the time axis is long.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

SEQ_AXIS = "seq"


def make_seq_pipeline_scan(
    mesh: jax.sharding.Mesh,
    forget_bias: float = 1.0,
):
    """Returns ``fn(xs [M,B,T,E], W [E+H,4H], b [4H], c0, h0 [M,B,H])
    -> (hs [M,B,T,H], c_T, h_T [M,B,H])`` with T sharded over ``seq``.

    Exactly equals a sequential scan over each microbatch (parity test);
    wall-clock scales ~P/(1 + (P−1)/M) over one device.
    """
    Pn = mesh.shape[SEQ_AXIS]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, SEQ_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(None, None, SEQ_AXIS, None), P(SEQ_AXIS), P(SEQ_AXIS)),
        check_vma=False,
    )
    def pipeline(xs_local, W, b, c0, h0):
        # xs_local [M, B, TB, E]: this device's time block of every microbatch
        M, B, TB, E = xs_local.shape
        H = h0.shape[-1]
        p = jax.lax.axis_index(SEQ_AXIS)

        def block_scan(carry, x_t):
            c, h = carry
            z = jnp.concatenate([x_t, h], axis=-1) @ W + b
            i, j, f, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (c, h), h

        def round_fn(r, state):
            hs_acc, recv_c, recv_h, done_c, done_h = state
            m = r - p  # microbatch this device works on this round
            active = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            # stage input carry: microbatch m's carry after block p-1;
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
            # last stage records the final carry for its microbatch
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
        zeros = jnp.zeros((B, H), jnp.float32)
        state = (hs_acc, zeros, zeros, jnp.zeros((M, B, H)), jnp.zeros((M, B, H)))
        hs_acc, _, _, done_c, done_h = jax.lax.fori_loop(
            0, M + Pn - 1, round_fn, state
        )
        # final carries live on the last stage only; gather via psum of the
        # one-hot-owned values (every other shard contributes zeros).
        mine = (jax.lax.axis_index(SEQ_AXIS) == Pn - 1).astype(jnp.float32)
        done_c = jax.lax.psum(done_c * mine, SEQ_AXIS)
        done_h = jax.lax.psum(done_h * mine, SEQ_AXIS)
        # out_specs P(SEQ_AXIS) on the carries: hand each shard its slice
        # of the microbatch axis (caller asserts M % Pn == 0).
        sl = jax.lax.axis_index(SEQ_AXIS) * (done_c.shape[0] // Pn)
        return (
            hs_acc,
            jax.lax.dynamic_slice_in_dim(done_c, sl, done_c.shape[0] // Pn, 0),
            jax.lax.dynamic_slice_in_dim(done_h, sl, done_h.shape[0] // Pn, 0),
        )

    def fn(xs, W, b, c0, h0):
        M = xs.shape[0]
        assert M % Pn == 0, (
            f"microbatch count {M} must divide seq axis {Pn} "
            "(carry output sharding)"
        )
        assert xs.shape[2] % Pn == 0, "T must divide over the seq axis"
        return pipeline(xs, W, b, c0, h0)

    return fn


def seq_pipeline_ref(xs, W, b, c0, h0, forget_bias: float = 1.0):
    """Sequential reference: independent scan per microbatch."""

    def one(x, c, h):
        def step(carry, x_t):
            c, h = carry
            z = jnp.concatenate([x_t, h], axis=-1) @ W + b
            i, j, f, o = jnp.split(z, 4, axis=-1)
            c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (c, h), h

        (c_f, h_f), hs = jax.lax.scan(step, (c, h), jnp.moveaxis(x, 1, 0))
        return jnp.moveaxis(hs, 0, 1), c_f, h_f

    return jax.vmap(one)(xs, c0, h0)
