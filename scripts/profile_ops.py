"""Device-true per-op timing via on-device repeat loops (dev tool).

Through the tunneled PJRT backend every host fetch costs ~25-30 ms, so
single-call timings are RPC-bound.  Here each op runs K times inside one
jitted ``lax.fori_loop`` with a data dependency, and only a scalar returns
to the host: per-iteration time = (total - rpc_floor) / K.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from jlm_tpu.config import Config
from jlm_tpu.models.params import init_params
from jlm_tpu.models.lstm import embed, lstm_step
from jlm_tpu.ops.project import project_lse
from jlm_tpu.ops.quant import quantize_params

K = 50


def timeloop(name, fn, x0, *args):
    """fn: (x, *args) -> x'; runs K times on device, returns ms/iter."""

    @jax.jit
    def loop(x0, *args):
        def body(i, x):
            return fn(x, *args)
        x = jax.lax.fori_loop(0, K, body, x0)
        return jnp.sum(jax.tree.leaves(x)[0][..., :1])

    # warmup/compile
    float(loop(x0, *args))
    reps = []
    for _ in range(3):
        t0 = time.time()
        float(loop(x0, *args))
        reps.append(time.time() - t0)
    total = min(reps)
    print(f"{name:36s}: {total/K*1e3:8.3f} ms/iter  (loop {total*1e3:.0f} ms)",
          flush=True)
    return total / K


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = Config(vocab_size=50_000, embed_size=256, hidden_size=512,
                 beam_width=10, seed=0)
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    qparams = jax.tree.map(jnp.asarray, quantize_params(init_params(cfg)),
                           is_leaf=lambda x: isinstance(x, np.ndarray))
    S, B = 128, cfg.beam_pad
    R, H, L = S * B, cfg.hidden_size, cfg.num_layers
    print(f"R={R} H={H} V={cfg.vocab_size}", flush=True)

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
    state = (jnp.zeros((L, R, H)), jnp.zeros((L, R, H)))
    words = jnp.asarray(rng.integers(0, 50_000, (R,)), jnp.int32)

    # rpc floor: trivial op
    timeloop("rpc_floor(add)", lambda x: x + 1.0, h0)

    # 1. Pallas lse head, fp32 weights, bf16 MXU
    timeloop(
        "project_lse pallas bf16 fp32-w",
        lambda x: x.at[:, :1].add(project_lse(
            x, params["head"], cfg, compute_dtype=jnp.bfloat16,
            interpret=False) * 1e-9),
        h0,
    )
    # 2. Pallas lse head, int8 weights (in-kernel dequant)
    timeloop(
        "project_lse pallas bf16 int8-w",
        lambda x: x.at[:, :1].add(project_lse(
            x, qparams["head"], cfg, compute_dtype=jnp.bfloat16,
            interpret=False) * 1e-9),
        h0,
    )
    # 3. plain XLA head: h @ W bf16 + lse
    W = params["head"]["W"]
    b = params["head"]["b"]

    def xla_head(x):
        logits = jnp.dot(x.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) + b
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        return x.at[:, :1].add(lse * 1e-9)

    timeloop("xla full head bf16 + lse", xla_head, h0)

    # 4. LSTM step at R rows
    def lstm_op(x):
        h_top, _ = lstm_step(params, cfg, x[:, :cfg.embed_size], state,
                             "default")
        return x.at[:, :1].add(h_top[:, :1] * 1e-9)

    timeloop("lstm_step R rows (bf16-class)", lstm_op, h0)

    def lstm_hi(x):
        h_top, _ = lstm_step(params, cfg, x[:, :cfg.embed_size], state,
                             "highest")
        return x.at[:, :1].add(h_top[:, :1] * 1e-9)

    timeloop("lstm_step R rows (fp32 highest)", lstm_hi, h0)

    # 5. candidate gather (engine's per-sentence column gather)
    from jlm_tpu.decoder.engine import _candidate_logits_batched
    ids = jnp.asarray(rng.integers(0, 50_000, (S, 65)), jnp.int32)

    def gather_op(x):
        raw = _candidate_logits_batched(params["head"], cfg, x, ids, S, B)
        return x.at[:, :1].add(jnp.sum(raw) * 1e-9)

    timeloop("cand column gather", gather_op, h0)

    # 6. embed
    def embed_op(x):
        e = embed(params, words)
        return x.at[:, :1].add(e[:, :1] * 1e-9)

    timeloop("embedding lookup", embed_op, h0)


if __name__ == "__main__":
    main()
