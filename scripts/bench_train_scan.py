#!/usr/bin/env python
"""Training-step time: XLA lax.scan LSTM vs the fused Pallas fwd+bwd kernel.

VERDICT r1 #9 done-bar: grad parity (tests/test_kernels.py) plus a measured
step-time win at flagship training dims.  This times ONE optimizer step
(forward + backward + adam update) of the full LM with both scan
implementations, plus forward-only (the PPL-eval path).

Usage: python scripts/bench_train_scan.py [--batch 64] [--steps 32]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--dsoftmax", action="store_true",
                    help="D-softmax head (config-5 shape with --vocab "
                         "100000 --layers 2): A/B the per-block fused CE "
                         "vs XLA CE (VERDICT r3 #7 done-bar)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jlm_tpu.config import Config, default_dsoftmax_blocks
    from jlm_tpu.models.lstm import forward_hidden, forward_hidden_pallas
    from jlm_tpu.models.heads import full_softmax_loss
    from jlm_tpu.models.params import init_params

    cfg = Config(
        vocab_size=args.vocab, embed_size=256, hidden_size=512,
        num_layers=args.layers, batch_size=args.batch, num_steps=args.steps,
        head="dsoftmax" if args.dsoftmax else "full",
        dsoftmax=default_dsoftmax_blocks(args.vocab, 512)
        if args.dsoftmax else None,
    )
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 200, (args.batch, args.steps + 1)), jnp.int32)
    c0 = jnp.zeros((cfg.num_layers, args.batch, cfg.hidden_size))
    h0 = jnp.zeros_like(c0)

    def make_step(fwd, c=None):
        c_ = c or cfg

        def loss_fn(p):
            hs, _ = fwd(p, ids[:, :-1])
            return full_softmax_loss(p, c_, hs, ids[:, 1:], precision="default")

        @jax.jit
        def step(p, o):
            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = opt.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        return step

    cfg_f = cfg.replace(fused_ce=True)
    fwd_xla = lambda p, x: forward_hidden(p, cfg, x, (c0, h0), precision="default")
    fwd_pls = lambda p, x: forward_hidden_pallas(
        p, cfg, x, (c0, h0), time_block=args.steps, compute_dtype=jnp.bfloat16
    )

    CH = 8

    def timeit(fn, *a):
        out = fn(*a)
        float(np.asarray(jax.tree.leaves(out)[-1]).reshape(-1)[0])

        def t(n):
            t0 = time.time()
            o = None
            for _ in range(n):
                o = fn(*a)
            float(np.asarray(jax.tree.leaves(o)[-1]).reshape(-1)[0])
            return time.time() - t0

        ts = min(t(1) for _ in range(3))
        tc = min(t(CH) for _ in range(3))
        return max((tc - ts) / (CH - 1), 1e-9)

    tok = args.batch * args.steps
    for name, fwd, c in (
        ("xla_scan", fwd_xla, None),
        ("pallas_scan", fwd_pls, None),
        ("xla+fusedCE", fwd_xla, cfg_f),
        ("pallas+fusedCE", fwd_pls, cfg_f),
    ):
        step = make_step(fwd, c)
        dt = timeit(step, params, opt_state)
        log(f"train step {name:12s} {dt*1e3:7.2f} ms  "
            f"{tok/dt:10.0f} tokens/s")

        @jax.jit
        def fonly(p):
            hs, _ = fwd(p, ids[:, :-1])
            return hs.sum()

        dtf = timeit(fonly, params)
        log(f"fwd only   {name:12s} {dtf*1e3:7.2f} ms  "
            f"{tok/dtf:10.0f} tokens/s")


if __name__ == "__main__":
    main()
