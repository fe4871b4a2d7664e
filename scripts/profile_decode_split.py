#!/usr/bin/env python
"""Ablation profile of the batched decode scan: where does the time go?

VERDICT r1 #1: the headline decode (S=128 sentences, beam-10, T=16 frames,
50k vocab) ran at ~19 TFLOP/s end-to-end while the Pallas head kernel alone
measures ~140 TFLOP/s — ~85% of wall time was outside the head and never
profiled.  `jax.profiler` traces are unreliable through the tunneled axon
backend, so this script measures by ABLATION: the same `_decode_scan` is
jitted with forward_fn variants that each add one component, and deltas
between variants attribute the time.

Variants (cumulative unless noted):
  skeleton    forward returns constants — scan framework only (lattice
              unpack, extension gather, top-k, state gather, cache writes,
              backtrack)
  lstm_bf16   + LSTM step (bf16 MXU)
  lstm_fp32   + LSTM step (precision="highest", 6-pass fp32)   [alt branch]
  lstm_lse    + Pallas projection logsumexp kernel (the O(V) work)
  lstm_cand   + candidate-column gather (no lse)                [alt branch]
  pallas_full lstm_bf16 + lse + cand gather  (the shipping speed path)
  jnp_full    full softmax head via XLA (reference path, bf16)

Prints a table + per-frame ms + achieved TFLOP/s for the full variants.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from jlm_tpu.config import Config, EOS_ID
    from jlm_tpu.data import Lexicon, build_vocab, generate_corpus, generate_test_set
    from jlm_tpu.decoder.engine import (
        _candidate_logits_batched,
        _decode_scan,
        build_decode_head,
        full_softmax_forward,
        make_pallas_forward,
        pack_lattice_batch,
    )
    from jlm_tpu.decoder.lattice import build_lattice
    from jlm_tpu.models.lstm import embed, lstm_step
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.project import project_lse

    config = Config(
        vocab_size=50_000, embed_size=256, hidden_size=512, num_layers=1,
        beam_width=10, n_best_max=1, seed=0,
    )
    vocab = build_vocab(generate_corpus(2000, seed=1234), config.vocab_size)
    lexicon = Lexicon.from_vocab(vocab)
    params = dict(jax.tree.map(jnp.asarray, init_params(config)))
    params["_decode"] = build_decode_head(params, config, jnp.bfloat16)
    kanas = [k for k, _ in generate_test_set(50, seed=777)]
    stream = (kanas * ((args.batch + 49) // 50))[: args.batch]

    lattices = [build_lattice(k, lexicon, vocab, config) for k in stream]
    packed, lengths = pack_lattice_batch(lattices)
    t_bucket = 16
    packed = jnp.asarray(packed[:, :t_bucket])
    lengths = jnp.asarray(lengths)
    S = packed.shape[0]
    B = config.beam_pad
    H = config.hidden_size
    V = config.vocab_size
    E = config.embed_size
    n_chars = sum(len(k) for k in stream)
    log(f"shape: S={S} B={B} T={t_bucket} V={V} H={H} chars={n_chars}")

    # ---- forward_fn variants ------------------------------------------------
    def fwd_skeleton(p, words, state, cand_words):
        Sx, Bx = words.shape
        C = cand_words.shape[1]
        z = jnp.zeros((Sx, Bx, C), jnp.float32)
        return z, z[:, :, 0], state

    def make_lstm_only(precision):
        def fwd(p, words, state, cand_words):
            Sx, Bx = words.shape
            C = cand_words.shape[1]
            x = embed(p, words.reshape(Sx * Bx))
            h_top, state = lstm_step(p, config, x, state, precision=precision)
            # use h_top so the LSTM isn't DCE'd; no head work
            v = jnp.sum(h_top, axis=1).reshape(Sx, Bx, 1) * 1e-30
            cand = jnp.broadcast_to(v, (Sx, Bx, C))
            return cand, v[:, :, 0], state
        return fwd

    def fwd_lstm_lse(p, words, state, cand_words):
        Sx, Bx = words.shape
        C = cand_words.shape[1]
        x = embed(p, words.reshape(Sx * Bx))
        h_top, state = lstm_step(p, config, x, state, precision="default")
        lse = project_lse(h_top, p["_decode"]["head_c"], config,
                          compute_dtype=jnp.bfloat16, interpret=False)
        v = lse.reshape(Sx, Bx, 1) * 1e-30
        return jnp.broadcast_to(v, (Sx, Bx, C)), v[:, :, 0], state

    def fwd_lstm_lse_fp32w(p, words, state, cand_words):
        # round-1 comparison: fp32 weights streamed through the kernel
        Sx, Bx = words.shape
        C = cand_words.shape[1]
        x = embed(p, words.reshape(Sx * Bx))
        h_top, state = lstm_step(p, config, x, state, precision="default")
        lse = project_lse(h_top, p["head"], config,
                          compute_dtype=jnp.bfloat16, interpret=False)
        v = lse.reshape(Sx, Bx, 1) * 1e-30
        return jnp.broadcast_to(v, (Sx, Bx, C)), v[:, :, 0], state

    def fwd_lstm_cand(p, words, state, cand_words):
        Sx, Bx = words.shape
        x = embed(p, words.reshape(Sx * Bx))
        h_top, state = lstm_step(p, config, x, state, precision="default")
        ids = jnp.concatenate(
            [cand_words, jnp.full((Sx, 1), EOS_ID, jnp.int32)], axis=1)
        raw = _candidate_logits_batched(p["head"], config, h_top, ids, Sx, Bx)
        return raw[:, :, :-1] * 1e-30, raw[:, :, -1] * 1e-30, state

    fwd_pallas_full = make_pallas_forward(config, compute_dtype=jnp.bfloat16,
                                          interpret=False)

    # round-3-style split path (separate cell + cand_dot + lse kernels) for
    # A/B against the round-4 fused cell_cand frame kernel
    def make_split_forward():
        from jlm_tpu.ops.cand_dot import cand_dot
        from jlm_tpu.ops.lstm_cell import lstm_cell_step
        from jlm_tpu.ops.project import project_lse as plse

        def forward(p, words, state, payload):
            Sx, Bx = words.shape
            x = embed(p, words.reshape(Sx * Bx))
            c, h = state
            new_c, new_h = [], []
            for l, layer in enumerate(p["_decode"]["lstm_c"]):
                c_l, h_l = lstm_cell_step(
                    x, h[l], c[l], layer["W"], layer["b"], config.forget_bias,
                    compute_dtype=jnp.bfloat16, interpret=False)
                new_c.append(c_l)
                new_h.append(h_l.astype(jnp.float32))
                x = h_l
            h_top = x
            state = (jnp.stack(new_c), jnp.stack(new_h))
            lse = plse(h_top, p["_decode"]["head_c"], config,
                       compute_dtype=jnp.bfloat16, interpret=False)
            h3 = h_top.reshape(Sx, Bx, -1)
            raw = cand_dot(h3.astype(jnp.bfloat16), payload["cols"],
                           payload["bias"], interpret=False)
            logp = raw - lse.reshape(Sx, Bx, 1)
            return logp[:, :, :-1], logp[:, :, -1], state

        forward.prepare = fwd_pallas_full.prepare
        forward.compute_dtype = jnp.bfloat16
        return forward

    # int8 variants (quantized weights): native MXU vs in-kernel dequant
    from jlm_tpu.ops.quant import quantize_params

    params_q = dict(jax.tree.map(jnp.asarray, quantize_params(
        jax.tree.map(np.asarray, init_params(config)))))
    params_q["_decode"] = build_decode_head(params_q, config, jnp.bfloat16)
    fwd_int8_mxu = make_pallas_forward(config, compute_dtype=jnp.bfloat16,
                                       interpret=False, int8_mxu=True)
    fwd_int8_deq = make_pallas_forward(config, compute_dtype=jnp.bfloat16,
                                       interpret=False, int8_mxu=False)

    def fwd_jnp_full(p, words, state, cand_words):
        return full_softmax_forward(p, config, words, state, cand_words,
                                    precision="default")

    variants = [
        ("skeleton", fwd_skeleton),
        ("lstm_bf16", make_lstm_only("default")),
        ("lstm_lse", fwd_lstm_lse),
        ("lstm_lse_fp32w", fwd_lstm_lse_fp32w),
        ("lstm_cand", fwd_lstm_cand),
        ("pallas_full", fwd_pallas_full),
        ("pallas_split_r3", make_split_forward()),
        ("int8_mxu", fwd_int8_mxu),
        ("int8_dequant", fwd_int8_deq),
        ("jnp_full", fwd_jnp_full),
    ]

    # block_until_ready does NOT synchronize through the tunneled axon
    # backend — only a device->host fetch does.  Separate tunnel RPC latency
    # from device compute by chaining CH dispatches before one tiny fetch:
    #   t_single = 1 call + fetch;  t_chain = CH calls + fetch
    #   device ms/call ~= (t_chain - t_single) / (CH - 1)
    def fetch(out):
        return float(np.asarray(out["final_topk"])[0, 0])

    results = {}
    CH = 8
    for name, fwd in variants:
        p_use = params_q if name.startswith("int8") else params
        fn = jax.jit(functools.partial(_decode_scan, config=config,
                                       forward_fn=fwd))
        t0 = time.time()
        fetch(fn(p_use, packed, lengths))
        compile_s = time.time() - t0

        def t_single():
            t0 = time.time()
            fetch(fn(p_use, packed, lengths))
            return time.time() - t0

        def t_chain():
            t0 = time.time()
            out = None
            for _ in range(CH):
                out = fn(p_use, packed, lengths)
            fetch(out)
            return time.time() - t0

        ts = min(t_single() for _ in range(3))
        tc = min(t_chain() for _ in range(3))
        dev = max((tc - ts) / (CH - 1), 1e-9)
        results[name] = dev
        log(f"{name:12s} dev {dev*1e3:8.2f} ms/call  single+rpc {ts*1e3:7.1f} ms"
            f"  {dev/t_bucket*1e3:6.2f} ms/frame  (compile {compile_s:.0f}s)"
            f"  {n_chars/dev:9.0f} chars/s device-limit")

    # FLOP model for the full path (per frame): LSTM + head + cand gather
    lstm_flops = 2 * S * B * (E + H) * 4 * H
    head_flops = 2 * S * B * H * V
    frames = t_bucket
    total = frames * (lstm_flops + head_flops)
    for name in ("pallas_full", "jnp_full"):
        if name in results:
            tf = total / results[name] / 1e12
            log(f"{name}: {tf:.1f} TFLOP/s achieved "
                f"({100*tf/197:.1f}% of v5e bf16 peak)")

    # component attribution
    sk = results["skeleton"]
    log("--- attribution (deltas vs skeleton) ---")
    log(f"skeleton:        {sk*1e3:7.2f} ms")
    log(f"lstm bf16:       {(results['lstm_bf16']-sk)*1e3:7.2f} ms")
    log(f"lse bf16 w:      {(results['lstm_lse']-results['lstm_bf16'])*1e3:7.2f} ms")
    log(f"lse fp32 w:      {(results['lstm_lse_fp32w']-results['lstm_bf16'])*1e3:7.2f} ms")
    log(f"cand gather(old):{(results['lstm_cand']-results['lstm_bf16'])*1e3:7.2f} ms")
    log(f"full (pallas):   {results['pallas_full']*1e3:7.2f} ms")
    log(f"full (jnp):      {results['jnp_full']*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
