#!/usr/bin/env python
"""A/B the in-scan beam-prune top-k: argmax passes vs sort-based lax.top_k.

VERDICT r4 weak #1 lever: XLA's TopK on TPU is sort-based; at the decode
scan's [512, 640] -> 10 shape the r4 skeleton attributed ~1.0 ms/frame to
gathers + top-k + ring writes.  This measures the whole jitted decode scan
under both Config.topk_mode values (same lattices, same weights), chained
dispatch, best-of passes — the number that matters, not a microbench.

Run on the TPU:  python scripts/profile_topk.py [--batch 512] [--reps 6]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--hidden", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jlm_tpu.config import Config
    from jlm_tpu.data import (
        Lexicon, build_vocab, generate_corpus, generate_test_set,
    )
    from jlm_tpu.decoder.engine import BeamDecoder
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.quant import quantize_params

    base = Config(
        vocab_size=args.vocab, embed_size=min(256, args.hidden),
        hidden_size=args.hidden, num_layers=1,
        beam_width=10, n_best_max=1, seed=0,
    )
    vocab = build_vocab(generate_corpus(2000, seed=1234), base.vocab_size)
    lexicon = Lexicon.from_vocab(vocab)
    qp = quantize_params(init_params(base))
    kanas = [k for k, _ in generate_test_set(50, seed=777)]
    stream = (kanas * ((args.batch + 49) // 50))[: args.batch]
    chars = sum(len(k) for k in stream)

    results = {}
    variants = [
        ("argmax", 1, "take"), ("sort", 1, "take"), ("argmax", 2, "take"),
        ("argmax", 4, "take"), ("argmax", 1, "onehot"),
        ("argmax", 2, "onehot"),
    ]
    for mode, unroll, gather in variants:
        cfg = base.replace(topk_mode=mode, scan_unroll=unroll,
                           gather_mode=gather)
        eng = BeamDecoder(qp, lexicon, vocab, cfg, precision="default")
        eng.decode_stream(stream * args.reps, chunk_size=args.batch,
                          n_best=1)  # compile + warm
        dt = float("inf")
        for _ in range(3):
            t0 = time.time()
            res = eng.decode_stream(stream * args.reps,
                                    chunk_size=args.batch, n_best=1)
            dt = min(dt, (time.time() - t0) / args.reps)
        results[(mode, unroll, gather)] = (chars / dt, res)
        log(f"topk={mode} unroll={unroll} gather={gather}: "
            f"{chars / dt:.1f} chars/s ({1e3 * dt:.1f} ms/chunk)")

    # parity between variants must be EXACT (identical tie rule/math)
    ref = results[("sort", 1, "take")][1]
    for key, (_, res) in results.items():
        same = sum(a[0].segments == b[0].segments for a, b in zip(res, ref))
        log(f"path identity {key} vs sort: {same}/{len(ref)}")
        assert same == len(ref), key
    print({f"{m}_u{u}_{g}": round(v[0], 1)
           for (m, u, g), v in results.items()})


if __name__ == "__main__":
    main()
