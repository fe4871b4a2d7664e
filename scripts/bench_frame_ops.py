#!/usr/bin/env python
"""Standalone microbench of the decode-frame ops at engine shapes.

Times each candidate implementation of the frame step's three components
(LSTM cell, per-sentence candidate scoring, head logsumexp) in isolation
with chained dispatch (tunnel-safe timing), so frame-structure decisions
(fuse vs split, tile sizes) rest on measured numbers instead of scan
deltas.  Shapes: S=512 sentences x beam_pad=10 rows, H=512, V=50k.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, args, reps=24):
    """Chained-dispatch timing: returns device ms/call."""
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    out = fn(*args)
    jax_block(out)
    t_single = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    t_chain = time.time() - t0
    return max((t_chain - t_single) / (reps - 1), 1e-9)


def jax_block(out):
    import jax

    leaves = jax.tree.leaves(out)
    np.asarray(leaves[0]).ravel()[:1]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jlm_tpu.config import Config
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.cand_dot import cand_dot
    from jlm_tpu.ops.frame_step import cell_cand_step
    from jlm_tpu.ops.lstm_cell import lstm_cell_step
    from jlm_tpu.ops.project import project_lse
    from jlm_tpu.ops.quant import quantize_params

    S, B, E, H, V, C1 = 512, 10, 256, 512, 50_000, 65
    R = S * B
    config = Config(vocab_size=V, embed_size=E, hidden_size=H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.01)
    cols = jnp.asarray(
        rng.normal(size=(S, C1, H)).astype(np.float32) * 0.1
    ).astype(jnp.bfloat16)
    cbias = jnp.asarray(rng.normal(size=(S, C1)).astype(np.float32) * 0.01)
    xb, hb = x.astype(jnp.bfloat16), h.astype(jnp.bfloat16)
    Wb = W.astype(jnp.bfloat16)

    params = init_params(config)
    head_f = {"W": jnp.asarray(params["head"]["W"]).astype(jnp.bfloat16),
              "b": jnp.asarray(params["head"]["b"])}
    qp = quantize_params(params)
    head_q = {"W": {"q": jnp.asarray(qp["head"]["W"]["q"]),
                    "scale": jnp.asarray(qp["head"]["W"]["scale"])},
              "b": jnp.asarray(qp["head"]["b"])}

    results = {}

    # --- LSTM cell variants ---
    def xla_cell(x, h, c, W, b):
        z = jnp.concatenate([x, h], axis=1) @ W + b
        i, j, f, o = jnp.split(z.astype(jnp.float32), 4, axis=1)
        cn = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(j)
        hn = jax.nn.sigmoid(o) * jnp.tanh(cn)
        return cn, hn.astype(jnp.bfloat16)

    results["cell_xla_bf16"] = timeit(
        jax.jit(xla_cell), (xb, hb, c, Wb, b))
    results["cell_pallas"] = timeit(
        jax.jit(functools.partial(
            lstm_cell_step, forget_bias=1.0, compute_dtype=jnp.bfloat16)),
        (x, h, c, W, b))

    # --- candidate scoring variants ---
    h3 = hb.reshape(S, B, H)
    results["cand_dot_pallas"] = timeit(
        jax.jit(cand_dot), (h3, cols, cbias))
    results["cand_einsum_xla"] = timeit(
        jax.jit(lambda a, b_, c_: jnp.einsum(
            "sbh,sch->sbc", a.astype(jnp.float32), b_.astype(jnp.float32),
            preferred_element_type=jnp.float32) + c_[:, None, :]),
        (h3, cols, cbias))

    # --- fused cell+cand ---
    results["cell_cand_fused"] = timeit(
        jax.jit(functools.partial(
            cell_cand_step, B=B, forget_bias=1.0,
            compute_dtype=jnp.bfloat16)),
        (x, h, c, W, b, cols, cbias))

    # --- head lse variants ---
    results["lse_bf16"] = timeit(
        jax.jit(functools.partial(
            project_lse, config=config, compute_dtype=jnp.bfloat16)),
        (hb, head_f))
    results["lse_int8_mxu"] = timeit(
        jax.jit(functools.partial(
            project_lse, config=config, compute_dtype=jnp.bfloat16,
            int8_mxu=True)),
        (hb, head_q))
    results["lse_int8_deq"] = timeit(
        jax.jit(functools.partial(
            project_lse, config=config, compute_dtype=jnp.bfloat16)),
        (hb, head_q))
    results["matmul_raw_bf16"] = timeit(
        jax.jit(lambda a, w: (a @ w).astype(jnp.bfloat16)[:, :128]),
        (hb, head_f["W"]))

    log("--- frame-op microbench (S=512, B=10, H=512, V=50k) ---")
    for k, v in results.items():
        log(f"{k:20s} {v*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
