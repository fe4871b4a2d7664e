"""One-shot profiling of the decode path on the real TPU (dev tool).

Times each component of the batched decode at bench shapes so kernel work
targets the real hot spot (SURVEY.md §9.3.1: host-device chatter and
per-step overheads, not raw matmul FLOPs, dominate if unmanaged).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from jlm_tpu.config import Config
from jlm_tpu.data import build_vocab, Lexicon, generate_corpus, generate_test_set
from jlm_tpu.models.params import init_params
from jlm_tpu.decoder.engine import (
    BeamDecoder,
    _candidate_logits_batched,
    make_pallas_forward,
)
from jlm_tpu.models.lstm import embed, lstm_step
from jlm_tpu.ops.project import project_lse
from jlm_tpu.utils.profiling import device_timer


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    t_start = time.time()
    cfg = Config(vocab_size=50_000, embed_size=256, hidden_size=512,
                 beam_width=10, seed=0)
    vocab = build_vocab(generate_corpus(2000, seed=1234), cfg.vocab_size)
    lex = Lexicon.from_vocab(vocab)
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    kanas = [k for k, _ in generate_test_set(128, seed=777)]

    S, B = 128, cfg.beam_pad
    C, H, L = cfg.max_lookahead, cfg.hidden_size, cfg.num_layers
    R = S * B
    print(f"shapes: S={S} B={B} R={R} C={C} H={H}", flush=True)

    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 50_000, (S, B)), jnp.int32)
    state = (jnp.zeros((L, R, H)), jnp.zeros((L, R, H)))
    cand = jnp.asarray(rng.integers(0, 50_000, (S, C)), jnp.int32)
    h_flat = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
    ids = jnp.concatenate([cand, jnp.zeros((S, 1), jnp.int32)], axis=1)

    fwd = make_pallas_forward(cfg, compute_dtype=jnp.bfloat16)

    parts = {
        "lstm_step": jax.jit(lambda p, w, st: lstm_step(
            p, cfg, embed(p, w.reshape(R)), st, "highest")),
        "project_lse(pallas)": jax.jit(lambda p, h: project_lse(
            h, p["head"], cfg, compute_dtype=jnp.bfloat16, interpret=False)),
        "cand_gather": jax.jit(lambda p, h, i: _candidate_logits_batched(
            p["head"], cfg, h, i, S, B)),
        "forward_total": jax.jit(lambda p, w, st, c: fwd(p, w, st, c)),
    }
    args = {
        "lstm_step": (params, words, state),
        "project_lse(pallas)": (params, h_flat),
        "cand_gather": (params, h_flat, ids),
        "forward_total": (params, words, state, cand),
    }
    for name, fn in parts.items():
        t0 = time.time()
        dt = device_timer(fn, *args[name], reps=10)
        print(f"{name:22s}: {dt*1e3:8.2f} ms   (compile {time.time()-t0:.0f}s)",
              flush=True)

    dec = BeamDecoder(params, lex, vocab, cfg, precision="default")
    t0 = time.time()
    _ = dec.decode_batch(kanas)
    print(f"decode_batch compile+first: {time.time()-t0:.1f}s "
          f"(since start {time.time()-t_start:.1f}s)", flush=True)
    for rep in range(3):
        t0 = time.time()
        _ = dec.decode_batch(kanas)
        dt = time.time() - t0
        chars = sum(len(k) for k in kanas)
        print(f"decode_batch e2e: {dt*1e3:.0f} ms = {chars/dt:.0f} chars/s",
              flush=True)


if __name__ == "__main__":
    main()
