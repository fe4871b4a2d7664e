#!/usr/bin/env python
"""Per-kernel microbenchmarks on the real TPU (dev tool).

Validates the compiled (non-interpret) Pallas kernels on hardware and
compares them against the XLA reference implementations at flagship dims.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(f, x, n=20):
    """Device ms/op: loop n dependent iterations inside ONE jit call.

    Per-call sync through the tunneled backend costs ~30 ms, which would
    swamp per-op timing; chaining iterations on device amortizes it away.
    """

    def body(i, carry):
        out = f(carry)
        leaf = jax.tree.leaves(out)[0]
        return carry + 0.0 * leaf.ravel()[0].astype(carry.dtype)

    looped = jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    _ = np.asarray(looped(x)).ravel()[:1]  # compile + warm
    t0 = time.time()
    _ = np.asarray(looped(x)).ravel()[:1]
    return (time.time() - t0) / n * 1e3


def main():
    from jlm_tpu.config import Config
    from jlm_tpu.ops.lstm_scan import lstm_scan, lstm_scan_ref
    from jlm_tpu.ops.project import (
        project_candidates,
        project_candidates_ref,
        project_lse,
    )
    from jlm_tpu.ops.quant import quantize_weight

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # --- projection kernel at flagship decode dims -----------------------
    R, H, V, C = 800, 512, 50_000, 65  # 50 sentences x 16 beam rows
    h = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.3)
    w_f = rng.normal(size=(H, V)).astype(np.float32) * 0.05
    b = jnp.zeros((V,), jnp.float32)
    cand = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
    q = quantize_weight(w_f, axis=0)
    w_j = jnp.asarray(w_f)
    wq, ws = jnp.asarray(q["q"]), jnp.asarray(q["scale"])

    f_ref = jax.jit(lambda h: project_candidates_ref(h, w_j, None, b, cand))
    f_k32 = jax.jit(lambda h: project_candidates(h, w_j, None, b, cand))
    f_kq = jax.jit(lambda h: project_candidates(h, wq, ws, b, cand))
    f_kqb = jax.jit(
        lambda h: project_candidates(h, wq, ws, b, cand, compute_dtype=jnp.bfloat16)
    )
    cfg = Config(vocab_size=V, hidden_size=H)
    f_lse = jax.jit(
        lambda h: project_lse(h, {"W": wq, "b": b}, cfg, compute_dtype=jnp.bfloat16)
    )

    o_ref = np.asarray(f_ref(h))
    for name, f in [("xla fp32 ref", f_ref), ("pallas fp32", f_k32),
                    ("pallas int8", f_kq), ("pallas int8+bf16", f_kqb)]:
        ms = timed(f, h)
        err = float(np.abs(np.asarray(f(h))[:, :C] - o_ref).max())
        gb = H * V * (1 if "int8" in name else 4) / 1e9
        fl = 2 * R * H * V / 1e12
        print(f"{name:18s}: {ms:7.2f} ms  max_err={err:.2e} "
              f"({fl/ms*1e3:.1f} TFLOP/s, {gb/ms*1e3:.0f} GB/s wt)", flush=True)
    print(f"{'pallas lse only':18s}: {timed(f_lse, h):7.2f} ms", flush=True)

    # --- LSTM scan kernel at training dims -------------------------------
    B, T, E, H2 = 32, 128, 256, 512
    xs = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H2, 4 * H2)).astype(np.float32) * 0.05)
    bb = jnp.zeros((4 * H2,), jnp.float32)
    z = jnp.zeros((B, H2), jnp.float32)
    f_sref = jax.jit(lambda xs: lstm_scan_ref(xs, W, bb, z, z))
    f_sker = jax.jit(lambda xs: lstm_scan(xs, W, bb, z, z, 1.0, 32))
    o = np.asarray(f_sref(xs)[0])
    for name, f in [("xla lstm scan", f_sref), ("pallas lstm scan", f_sker)]:
        ms = timed(f, xs, n=5)
        err = float(np.abs(np.asarray(f(xs)[0]) - o).max())
        fl = 2 * B * T * (E + H2) * 4 * H2 / 1e12
        print(f"{name:18s}: {ms:7.2f} ms  max_err={err:.2e} "
              f"({fl/ms*1e3:.2f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
