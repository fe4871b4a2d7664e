#!/usr/bin/env python
"""In-scan A/B of decode-frame structures on the int8 head.

The standalone microbench (bench_frame_ops.py) shows the Pallas cell and
cand kernels at ~0.1 ms each, yet scan-level ablation attributes ~2 ms per
frame to cell+cand — the cost lives in the scan INTEGRATION (layout
transitions, fusion breaks around pallas_call boundaries), not the kernels.
This script times full `_decode_scan` runs with each cell/cand structure to
pick the fastest frame composition empirically.
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

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from jlm_tpu.config import Config
    from jlm_tpu.data import Lexicon, build_vocab, generate_corpus, generate_test_set
    from jlm_tpu.decoder.engine import (
        _decode_scan,
        build_decode_head,
        make_pallas_forward,
        pack_lattice_batch,
    )
    from jlm_tpu.decoder.lattice import build_lattice
    from jlm_tpu.models.lstm import embed
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.cand_dot import cand_dot
    from jlm_tpu.ops.frame_step import cell_cand_step
    from jlm_tpu.ops.lstm_cell import lstm_cell_step
    from jlm_tpu.ops.project import project_lse
    from jlm_tpu.ops.quant import quantize_params

    config = Config(
        vocab_size=50_000, embed_size=256, hidden_size=512, num_layers=1,
        beam_width=10, n_best_max=1, seed=0,
    )
    vocab = build_vocab(generate_corpus(2000, seed=1234), config.vocab_size)
    lexicon = Lexicon.from_vocab(vocab)
    params = dict(jax.tree.map(
        jnp.asarray, quantize_params(init_params(config))))
    params["_decode"] = build_decode_head(params, config, jnp.bfloat16)
    kanas = [k for k, _ in generate_test_set(50, seed=777)]
    stream = (kanas * 11)[:512]
    lattices = [build_lattice(k, lexicon, vocab, config) for k in stream]
    packed, lengths = pack_lattice_batch(lattices)
    t_bucket = 16
    packed = jnp.asarray(packed[:, :t_bucket])
    lengths = jnp.asarray(lengths)
    n_chars = sum(len(k) for k in stream)

    base = make_pallas_forward(config, compute_dtype=jnp.bfloat16,
                               interpret=False, int8_mxu=True)

    def lse_of(p, h_top):
        return project_lse(h_top, p["_decode"]["head_c"], config,
                           compute_dtype=jnp.bfloat16, interpret=False,
                           int8_mxu=True)

    def make_fwd(cell_kind, cand_kind):
        def forward(p, words, state, payload):
            S, B = words.shape
            x = embed(p, words.reshape(S * B))
            c, h = state
            layer = p["_decode"]["lstm_c"][0]
            if cell_kind == "fusedcand":
                c_l, h_top, raw = cell_cand_step(
                    x, h[0], c[0], layer["W"], layer["b"],
                    payload["cols"], payload["bias"], B, config.forget_bias,
                    compute_dtype=jnp.bfloat16, interpret=False)
                state = (c_l[None], h_top.astype(jnp.float32)[None])
                lse = lse_of(p, h_top)
                logp = raw - lse.reshape(S, B, 1)
                return logp[:, :, :-1], logp[:, :, -1], state
            if cell_kind == "pallas":
                c_l, h_top = lstm_cell_step(
                    x, h[0], c[0], layer["W"], layer["b"], config.forget_bias,
                    compute_dtype=jnp.bfloat16, interpret=False)
            else:  # xla
                z = (jnp.concatenate(
                    [x.astype(jnp.bfloat16),
                     h[0].astype(jnp.bfloat16)], axis=1)
                    @ layer["W"].astype(jnp.bfloat16) + layer["b"])
                i, j, f, o = jnp.split(z.astype(jnp.float32), 4, axis=1)
                c_l = (jax.nn.sigmoid(f + config.forget_bias) * c[0]
                       + jax.nn.sigmoid(i) * jnp.tanh(j))
                h_top = (jax.nn.sigmoid(o) * jnp.tanh(c_l)).astype(
                    jnp.bfloat16)
            state = (c_l[None], h_top.astype(jnp.float32)[None])
            lse = lse_of(p, h_top)
            h3 = h_top.reshape(S, B, -1)
            if cand_kind == "pallas":
                raw = cand_dot(h3.astype(jnp.bfloat16), payload["cols"],
                               payload["bias"], interpret=False)
            else:  # einsum
                raw = jnp.einsum(
                    "sbh,sch->sbc", h3.astype(jnp.float32),
                    payload["cols"].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ) + payload["bias"][:, None, :]
            logp = raw - lse.reshape(S, B, 1)
            return logp[:, :, :-1], logp[:, :, -1], state

        forward.prepare = base.prepare
        forward.compute_dtype = jnp.bfloat16
        return forward

    variants = [
        ("fused_cellcand", make_fwd("fusedcand", None)),
        ("pallas_cell+pallas_cand", make_fwd("pallas", "pallas")),
        ("pallas_cell+einsum_cand", make_fwd("pallas", "einsum")),
        ("xla_cell+pallas_cand", make_fwd("xla", "pallas")),
        ("xla_cell+einsum_cand", make_fwd("xla", "einsum")),
    ]

    def fetch(out):
        return float(np.asarray(out["final_topk"])[0, 0])

    CH = 8
    for name, fwd in variants:
        fn = jax.jit(functools.partial(_decode_scan, config=config,
                                       forward_fn=fwd))
        t0 = time.time()
        fetch(fn(params, packed, lengths))
        compile_s = time.time() - t0

        def t_single():
            t0 = time.time()
            fetch(fn(params, packed, lengths))
            return time.time() - t0

        def t_chain():
            t0 = time.time()
            out = None
            for _ in range(CH):
                out = fn(params, packed, lengths)
            fetch(out)
            return time.time() - t0

        ts = min(t_single() for _ in range(3))
        tc = min(t_chain() for _ in range(3))
        dev = max((tc - ts) / (CH - 1), 1e-9)
        log(f"{name:26s} dev {dev*1e3:7.2f} ms/call "
            f"{dev/t_bucket*1e3:6.2f} ms/frame "
            f"{n_chars/dev:9.0f} chars/s dev-limit (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
