#!/usr/bin/env python
"""Standalone sweep of the projection-lse kernel at the decode hot shape.

Separates MXU time from VPU (exp/logsumexp) time and finds the best
(tile_r, tile_v, weight dtype) for ``[2048, 512] x [512, 50k]``:

- xla_matmul:   plain jnp h @ W (bf16) — the MXU reference point
- kernel dtype/tile sweep: the real project_lse kernel
- kernel_nolse: same kernel with the exp/sum removed (matmul + max only)
  — the delta vs the full kernel is the VPU logsumexp cost

Timing via chained dispatch + single tiny fetch (block_until_ready does
not synchronize through the tunneled axon backend).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jlm_tpu.config import Config
    from jlm_tpu.ops.project import _project_block
    from jlm_tpu.ops.quant import quantize_weight

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192)  # engine hot shape S*B
    args = ap.parse_args()
    R, H, V = args.rows, 512, 50_176  # rows, hidden, vocab (padded to 2048)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(R, H)), jnp.float32) * 0.1
    W = jnp.asarray(rng.normal(size=(H, V)), jnp.float32) * 0.05
    b = jnp.zeros((V,), jnp.float32)
    qd = quantize_weight(np.asarray(W))
    Wq, Ws = jnp.asarray(qd["q"]), jnp.asarray(qd["scale"])
    Wbf = W.astype(jnp.bfloat16)
    cand = jnp.full((128,), -1, jnp.int32)
    flops = 2 * R * H * V
    CH = 16

    def timeit(fn, *args):
        out = fn(*args)
        first = jax.tree.leaves(out)[0]
        float(np.asarray(first).reshape(-1)[0])  # compile + sync

        def t_single():
            t0 = time.time()
            o = fn(*args)
            float(np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[0])
            return time.time() - t0

        def t_chain():
            t0 = time.time()
            o = None
            for _ in range(CH):
                o = fn(*args)
            float(np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[0])
            return time.time() - t0

        ts = min(t_single() for _ in range(2))
        tc = min(t_chain() for _ in range(2))
        return max((tc - ts) / (CH - 1), 1e-9)

    # --- XLA reference matmul (bf16) -------------------------------------
    @jax.jit
    def xla_mm(h, w):
        return jnp.dot(h.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32).sum()

    dt = timeit(xla_mm, h, Wbf)
    log(f"xla_matmul bf16      {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")

    # --- XLA full log-softmax normalizer (what jnp head pays) ------------
    @jax.jit
    def xla_lse(h, w):
        logits = jnp.dot(h.astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=1, keepdims=True)
        return (m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1,
                                    keepdims=True))).sum()

    dt = timeit(xla_lse, h, Wbf)
    log(f"xla_matmul+lse bf16  {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")

    # --- kernel sweep ------------------------------------------------------
    hbf = h.astype(jnp.bfloat16)
    for wname, w_arr, w_scale, int8_mxu, h_in in (
        ("bf16      ", Wbf, None, False, h),
        ("bf16 h=bf ", Wbf, None, False, hbf),
        ("int8 deq  ", Wq, Ws, False, h),
        ("int8 MXU  ", Wq, Ws, True, h),
        ("int8 MXU/b", Wq, Ws, True, hbf),
        ("fp32      ", W, None, False, h),
    ):
        for tr in (None, 512, 1024, 2048, 4096):
            for tv in (512, 1024, 2048):
                if tr is None and tv != 2048:
                    continue  # auto-sizer picks its own tv; run once
                if tr is not None:
                    # working-set filter (mirrors _project_block's r3
                    # auto-sizer: chunked logits, h in compute dtype)
                    need = (
                        2 * H * tv * w_arr.dtype.itemsize
                        + 2 * tr * H * 2
                        + 2 * tr * min(256, tv) * 4
                        + 4 * tr * 128 * 4
                        + (tr * H + tr * 128 * 4 if int8_mxu else 0)
                    )
                    if need > 13 * 1024 * 1024:
                        continue

                @jax.jit
                def run(h_in, w_arr=w_arr, w_scale=w_scale, tr=tr, tv=tv,
                        int8_mxu=int8_mxu):
                    _, m, s = _project_block(
                        h_in, w_arr, w_scale, b, cand,
                        tile_v=tv, compute_dtype=jnp.bfloat16,
                        interpret=False, tile_r=tr,
                        int8_mxu=int8_mxu, skip_cand=True,
                    )
                    return (m + jnp.log(s)).sum()

                try:
                    dt = timeit(run, h_in)
                    log(f"kernel {wname} tr={str(tr):>4s} tv={tv:4d} "
                        f"{dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")
                except Exception as e:
                    log(f"kernel {wname} tr={str(tr):>4s} tv={tv:4d} FAILED: "
                        f"{str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    main()
