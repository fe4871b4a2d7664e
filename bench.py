#!/usr/bin/env python
"""Benchmark: kana-kanji conversion chars/sec/chip on TPU vs the CPU oracle.

Protocol (BASELINE.md): no published digits exist for the reference, so the
measured numpy CPU oracle (BASELINE config 1: 1-layer 512-hidden LSTM, 50k
vocab, full softmax, greedy Viterbi over the fixed synthetic test file) is
the de-facto baseline.  The benchmarked TPU path is the harder config-2
workload — beam-10 lattice decoding, streaming batched over the whole test
set in one device-resident scan — at flagship dims on one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": "chars/s", "vs_baseline": ...}
Diagnostics (oracle baseline, parity vs oracle, timing splits) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    # Persistent compilation cache: the tunneled remote compile costs
    # minutes for the big batched-decode program; cache it across runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from jlm_tpu.config import Config
    from jlm_tpu.data import (
        Lexicon,
        build_vocab,
        generate_corpus,
        generate_test_set,
    )
    from jlm_tpu.decoder.engine import BeamDecoder
    from jlm_tpu.models.params import init_params
    from jlm_tpu.oracle import OracleDecoder, OracleLM

    log(f"devices: {jax.devices()}")

    # Flagship dims (BASELINE configs 1/2): vocab padded to 50k — the
    # synthetic lexicon occupies the low ids; the model pays the full
    # 50k-softmax cost either way, which is what we are measuring.
    config = Config(
        vocab_size=50_000,
        embed_size=256,
        hidden_size=512,
        num_layers=1,
        beam_width=10,
        n_best_max=1,  # top-1 bench: keep the fetched path payload minimal
        seed=0,
    )
    vocab = build_vocab(generate_corpus(2000, seed=1234), config.vocab_size)
    lexicon = Lexicon.from_vocab(vocab)
    params = init_params(config)
    tests = generate_test_set(50, seed=777)
    kanas = [k for k, _ in tests]
    n_chars = sum(len(k) for k in kanas)

    # --- CPU oracle baseline: config 1 (greedy, numpy) -------------------
    greedy_cfg = config.replace(beam_width=1)
    oracle = OracleDecoder(
        OracleLM(params, greedy_cfg), lexicon, vocab, greedy_cfg
    )
    # best-of-2 passes: the baseline must reflect the oracle's actual
    # speed, not transient CPU contention on the shared host
    oracle_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        oracle_results = [oracle.decode(k)[0] for k in kanas]
        oracle_dt = min(oracle_dt, time.time() - t0)
    baseline = n_chars / oracle_dt
    log(f"oracle (CPU greedy, config 1): {n_chars} chars in "
        f"{oracle_dt:.2f}s = {baseline:.1f} chars/s")

    # --- TPU engine: speed mode (beam-10, streaming batched) -------------
    # Streaming regime (BASELINE config 5's per-chip unit): many 512-lattice
    # chunks are DISPATCHED before any result is fetched, so chunk k's
    # device scan overlaps chunk k-1's result fetch — steady-state
    # throughput is device-limited, not round-trip-limited (the tunneled
    # host link costs ~30 ms per fetch, comparable to a whole device scan).
    #
    # The headline engine uses int8 weights on the native int8 MXU path —
    # the reference's OWN headline recipe is int8 quantization for speed
    # (SURVEY.md §4.3; JLM:README.md), and it is the fastest parity-checked
    # configuration in-engine (r3: 50.1k vs 45.6k chars/s for bf16 full
    # softmax at S=512).  Greedy top-1 parity vs the oracle is still
    # asserted on the exact fp32 path below.
    from jlm_tpu.ops.quant import quantize_params

    qp = quantize_params(params)
    # int8_mxu=True is the config DEFAULT since round 4: no opt-in flags —
    # quantized weights + precision="default" IS the headline recipe.
    engine = BeamDecoder(qp, lexicon, vocab, config, precision="default")
    # 2048-lattice chunks (round 5): under the onehot-selection frame
    # structure the r4 payload-pressure tradeoff flipped — interleaved
    # same-window A/Bs measured S=1024 +16% over S=512 and S=2048 +5%
    # over S=1024 (two independent windows).  The tunneled host link
    # costs ~30 ms per result fetch, so big pipelined chunks amortize it
    # either way.
    CHUNK = 2048
    stream = (kanas * ((CHUNK + 49) // 50))[:CHUNK]
    stream_chars = sum(len(k) for k in stream)
    t0 = time.time()
    results = engine.decode_batch(stream, n_best=1)
    log(f"tpu compile+first run: {time.time() - t0:.1f}s")
    reps = 12
    # Warm every length-sorted chunk shape once (distinct T buckets compile
    # separately) so the timed passes measure steady state, not compiles.
    engine.decode_stream(stream * reps, chunk_size=CHUNK, n_best=1)
    # best-of-4 passes: the tunneled relay's WINDOW varies the same
    # program's wall time by up to ~20% (and occasionally >5x); each pass
    # is under a second, so extra passes are cheap insurance that the
    # recorded number reflects the engine rather than the link.
    tpu_dt = float("inf")
    for _ in range(4):
        t0 = time.time()
        results = engine.decode_stream(stream * reps, chunk_size=CHUNK,
                                       n_best=1)
        tpu_dt = min(tpu_dt, (time.time() - t0) / reps)
    value = stream_chars / tpu_dt
    log(f"tpu (beam-10 streaming, {reps}x{len(stream)} lattices, "
        f"length-sorted chunks): {stream_chars * reps} chars in "
        f"{tpu_dt:.3f}s/chunk = {value:.1f} chars/s")
    results = results[: len(kanas)]

    # --- MFU accounting (BASELINE north star: kernels at speed-of-light) --
    B = config.beam_pad
    S, H, E, V = CHUNK, config.hidden_size, config.embed_size, config.vocab_size
    # Scanned frames: reproduce the engine's own chunking — length-sorted
    # stream, 512-sentence chunks, each scanning t_bucket(max len in chunk)
    # frames (VERDICT r2 weak #6: hardcoded frame counts silently
    # mis-compute MFU when the batching strategy changes).
    sorted_lens = sorted(len(k) for k in stream * reps)
    total_frames = sum(
        min(engine._t_bucket(max(sorted_lens[i:i + CHUNK])),
            config.max_kana_len)
        for i in range(0, len(sorted_lens), CHUNK)
    ) / reps  # per-rep frames across the sorted chunks
    lstm_fl = 2 * S * B * (E + H) * 4 * H
    head_fl = 2 * S * B * H * V
    tflops = total_frames * (lstm_fl + head_fl) / tpu_dt / 1e12
    # USEFUL-work MFU: counts only live beam rows (B = beam_pad = 10, no
    # padding waste since r3) — r1/r2 counted 16 padded rows, inflating
    # the percentage relative to the same chars/s.
    log(f"achieved {tflops:.1f} TFLOP/s useful over {total_frames:.1f} "
        f"frames/rep = {100 * tflops / 197:.1f}% of v5e bf16 peak (197); "
        f"int8-MXU head runs at 2x that rate")

    # --- parity: beam-1 fp32 engine must reproduce the oracle's exact
    # greedy paths (top-1 path identity, the BASELINE north-star check) ----
    greedy_eng = BeamDecoder(params, lexicon, vocab, greedy_cfg,
                             precision="highest")
    greedy_results = greedy_eng.decode_batch(kanas, n_best=1)
    exact = sum(
        r[0].segments == o.segments
        for r, o in zip(greedy_results, oracle_results)
    )
    log(f"greedy parity {exact}/{len(kanas)} (top-1 path identity vs oracle)")
    assert exact == len(kanas), "greedy path-identity parity failed"

    # --- beam parity at scale (VERDICT r3 #4): beam-10 top-1 PATH IDENTITY
    # vs the numpy oracle on all 50 sentences, for BOTH decode heads. ------
    # Referee 1: the int8-tolerance oracle (beam-10 over exactly-dequantized
    # int8 weights, fp32 math) judges the headline int8-MXU engine — its
    # in-kernel activation quantization perturbs scores ~1e-2 but must not
    # change the argmax path.
    beam_cfg = config  # beam_width=10
    orc_q = OracleDecoder(OracleLM(qp, beam_cfg), lexicon, vocab, beam_cfg)
    t0 = time.time()
    orc_beam_q = [orc_q.decode(k)[0] for k in kanas]
    log(f"oracle beam-10 referee (int8 dequant): {time.time() - t0:.1f}s")
    par_int8 = sum(
        r[0].segments == o.segments for r, o in zip(results, orc_beam_q)
    )
    log(f"beam parity {par_int8}/{len(kanas)} (path identity, int8-MXU head "
        "vs int8-tolerance oracle)")
    # Referee 2: the fp32 oracle judges the bf16 full-softmax head.
    bf16_eng = BeamDecoder(params, lexicon, vocab, config, precision="default")
    bf16_results = bf16_eng.decode_batch(kanas, n_best=1)
    orc_f = OracleDecoder(OracleLM(params, beam_cfg), lexicon, vocab, beam_cfg)
    t0 = time.time()
    orc_beam_f = [orc_f.decode(k)[0] for k in kanas]
    log(f"oracle beam-10 referee (fp32): {time.time() - t0:.1f}s")
    par_bf16 = sum(
        r[0].segments == o.segments for r, o in zip(bf16_results, orc_beam_f)
    )
    log(f"beam parity {par_bf16}/{len(kanas)} (path identity, bf16 head vs "
        "fp32 oracle)")

    print(
        json.dumps(
            {
                "metric": "kana_kanji_chars_per_sec_per_chip",
                "value": round(value, 1),
                "unit": "chars/s",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
