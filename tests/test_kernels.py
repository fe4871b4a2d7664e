"""Pallas kernel tests (interpret mode on CPU; SURVEY.md §9.1 layer 4).

Every kernel ships with a jnp reference and tolerance tests at the real
shapes from §4.2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jlm_tpu.ops.project import project_candidates, project_candidates_ref
from jlm_tpu.ops.quant import quantize_weight


@pytest.mark.parametrize("B,H,V,C", [(16, 512, 4096, 65), (8, 256, 2048, 17)])
def test_project_candidates_fp32(B, H, V, C):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    cand = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
    out = project_candidates(h, w, None, b, cand, tile_v=1024, interpret=True)
    ref = project_candidates_ref(h, w, None, b, cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_project_candidates_int8():
    rng = np.random.default_rng(1)
    B, H, V, C = 16, 512, 4096, 65
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w_f = rng.normal(size=(H, V)).astype(np.float32) * 0.05
    q = quantize_weight(w_f, axis=0)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    cand = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
    out = project_candidates(
        h,
        jnp.asarray(q["q"]),
        jnp.asarray(q["scale"]),
        b,
        cand,
        tile_v=1024,
        interpret=True,
    )
    # reference: dequantized fp32 math — the oracle's int8 parity rule
    ref = project_candidates_ref(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_project_candidates_int8_mxu_native():
    """Native int8 MXU path: int8 activations x int8 weights -> int32,
    rescaled fp32.  Activation quantization adds ~1/255 relative error per
    element; with H=512 the accumulated logit error stays well under 0.05
    for unit-scale activations (tolerance-tested, not exact — the exact
    path is the dequant-to-fp32 default)."""
    rng = np.random.default_rng(3)
    B, H, V, C = 16, 512, 4096, 65
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w_f = rng.normal(size=(H, V)).astype(np.float32) * 0.05
    q = quantize_weight(w_f, axis=0)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    cand = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
    out = project_candidates(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand,
        tile_v=1024, interpret=True, int8_mxu=True,
    )
    ref = project_candidates_ref(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
    # top-1 candidate must be stable under activation quantization here
    np.testing.assert_array_equal(
        np.argmax(np.asarray(out), axis=1), np.argmax(np.asarray(ref), axis=1)
    )


def test_int8_mxu_score_error_bound():
    """Pins the activation-quantization score-error bound of the DEFAULT
    int8-MXU head (config.int8_mxu=True since round 4): at the engine's
    H=512 with unit-scale activations, candidate log-probs deviate < 0.05
    from the exact-dequant path.  If this bound drifts, the beam-parity
    tolerance in bench.py and the oracle referee tolerances are wrong."""
    rng = np.random.default_rng(11)
    B, H, V, C = 32, 512, 4096, 65
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    q = quantize_weight(rng.normal(size=(H, V)).astype(np.float32) * 0.05,
                        axis=0)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    cand = jnp.asarray(rng.integers(0, V, C).astype(np.int32))
    mxu = project_candidates(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand,
        tile_v=1024, interpret=True, int8_mxu=True,
    )
    deq = project_candidates(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand,
        tile_v=1024, interpret=True, int8_mxu=False,
    )
    err = float(np.max(np.abs(np.asarray(mxu) - np.asarray(deq))))
    assert err < 0.05, f"int8-MXU activation-quant error {err} exceeds bound"


def test_project_lse_int8_mxu_matches_dequant():
    from jlm_tpu.config import Config
    from jlm_tpu.ops.project import project_lse

    rng = np.random.default_rng(4)
    B, H, V = 8, 256, 2048
    cfg = Config(vocab_size=V, embed_size=64, hidden_size=H)
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    q = quantize_weight(rng.normal(size=(H, V)).astype(np.float32) * 0.05, axis=0)
    head = {"W": {"q": jnp.asarray(q["q"]), "scale": jnp.asarray(q["scale"])},
            "b": jnp.zeros((V,), jnp.float32)}
    lse_n = project_lse(h, head, cfg, tile_v=512, interpret=True, int8_mxu=True)
    lse_d = project_lse(h, head, cfg, tile_v=512, interpret=True)
    np.testing.assert_allclose(np.asarray(lse_n), np.asarray(lse_d), atol=0.05)


def test_project_candidates_unaligned_vocab():
    """V not a multiple of the tile: padded columns must not leak into lse."""
    rng = np.random.default_rng(2)
    B, H, V, C = 4, 128, 1000, 7
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.1)
    b = jnp.zeros((V,), jnp.float32)
    cand = jnp.asarray([0, 1, 999, 500, 500, 3, 42], jnp.int32)
    out = project_candidates(h, w, None, b, cand, tile_v=512, interpret=True)
    ref = project_candidates_ref(h, w, None, b, cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # duplicate candidate columns agree
    np.testing.assert_allclose(np.asarray(out)[:, 3], np.asarray(out)[:, 4])


def test_project_candidates_remainder_chunk():
    """Padded vocab tile NOT a multiple of chunk_v=256 (e.g. V=300 -> tile
    384): the last 128-wide chunk must slice weights/scales/bias and build
    the candidate iota at the remainder width (ADVICE r3: full-width iota
    vs clamped weight slice crashed at trace time)."""
    rng = np.random.default_rng(7)
    B, H, V, C = 4, 128, 300, 9
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w_f = rng.normal(size=(H, V)).astype(np.float32) * 0.1
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    cand = jnp.asarray([0, 1, 299, 150, 257, 255, 256, 42, 299], jnp.int32)
    out = project_candidates(h, jnp.asarray(w_f), None, b, cand,
                             tile_v=512, interpret=True)
    ref = project_candidates_ref(h, jnp.asarray(w_f), None, b, cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # quantized variant exercises the scale-slice width too
    q = quantize_weight(w_f, axis=0)
    out_q = project_candidates(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand,
        tile_v=512, interpret=True,
    )
    ref_q = project_candidates_ref(
        h, jnp.asarray(q["q"]), jnp.asarray(q["scale"]), b, cand
    )
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref_q), atol=1e-4)


def test_project_candidates_normalization():
    """exp(logp) over ALL vocab ids sums to 1 — lse is global."""
    rng = np.random.default_rng(3)
    B, H, V = 2, 64, 256
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.1)
    b = jnp.zeros((V,), jnp.float32)
    cand = jnp.arange(V, dtype=jnp.int32)
    out = project_candidates(h, w, None, b, cand, tile_v=128, interpret=True)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(axis=1), 1.0, rtol=1e-4)


# ---------------------------------------------------------------------------
# Fused LSTM time-block scan kernel
# ---------------------------------------------------------------------------

from jlm_tpu.ops.lstm_scan import lstm_scan, lstm_scan_ref


@pytest.mark.parametrize("B,T,E,H,TB", [(8, 32, 256, 512, 16), (16, 8, 32, 64, 8)])
def test_lstm_scan_matches_ref(B, T, E, H, TB):
    rng = np.random.default_rng(4)
    xs = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.01)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    hs, cf, hf = lstm_scan(xs, W, b, c0, h0, 1.0, TB, jnp.float32, True)
    hs_r, cf_r, hf_r = lstm_scan_ref(xs, W, b, c0, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_r), atol=1e-5)


def test_lstm_scan_state_carry_across_windows():
    """Two chained kernel windows == one double-length reference scan."""
    rng = np.random.default_rng(5)
    B, T, E, H = 4, 16, 32, 64
    xs = jnp.asarray(rng.normal(size=(B, 2 * T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
    b = jnp.zeros((4 * H,), jnp.float32)
    z = jnp.zeros((B, H), jnp.float32)
    hs1, c1, h1 = lstm_scan(xs[:, :T], W, b, z, z, 1.0, 8, jnp.float32, True)
    hs2, c2, h2 = lstm_scan(xs[:, T:], W, b, c1, h1, 1.0, 8, jnp.float32, True)
    hs_r, cf_r, hf_r = lstm_scan_ref(xs, W, b, z, z)
    np.testing.assert_allclose(np.asarray(hs2), np.asarray(hs_r[:, T:]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(cf_r), atol=1e-5)


def test_lstm_scan_grad_flows():
    rng = np.random.default_rng(6)
    B, T, E, H = 2, 8, 16, 32
    xs = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
    b = jnp.zeros((4 * H,), jnp.float32)
    z = jnp.zeros((B, H), jnp.float32)

    def loss_k(W):
        hs, _, _ = lstm_scan(xs, W, b, z, z, 1.0, 8, jnp.float32, True)
        return jnp.sum(hs ** 2)

    def loss_r(W):
        hs, _, _ = lstm_scan_ref(xs, W, b, z, z)
        return jnp.sum(hs ** 2)

    gk = jax.grad(loss_k)(W)
    gr = jax.grad(loss_r)(W)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)


@pytest.mark.parametrize("B,T,E,H,TB", [(4, 16, 32, 64, 8), (8, 12, 16, 128, 4)])
def test_lstm_scan_pallas_backward_all_grads(B, T, E, H, TB):
    """The Pallas backward kernel matches the XLA-scan VJP on EVERY input
    cotangent (xs, W, b, c0, h0) with grads flowing from all three outputs."""
    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.01)
    c0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32) * 0.1)
    wh = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    wc = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))

    def loss(fn):
        def f(xs, W, b, c0, h0):
            hs, cf, hf = fn(xs, W, b, c0, h0)
            return jnp.sum(hs * wh) + jnp.sum(cf * wc) + jnp.sum(hf * wc)
        return f

    gk = jax.grad(
        loss(lambda *a: lstm_scan(*a, 1.0, TB, jnp.float32, True)),
        argnums=(0, 1, 2, 3, 4),
    )(xs, W, b, c0, h0)
    gr = jax.grad(loss(lstm_scan_ref), argnums=(0, 1, 2, 3, 4))(xs, W, b, c0, h0)
    for k, r, name in zip(gk, gr, ["xs", "W", "b", "c0", "h0"]):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), atol=2e-4, rtol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_lstm_scan_vmem_overflow_falls_back_to_ref():
    """Dims whose weights alone bust the VMEM budget must run the jnp
    fallback (VERDICT r1 weak #6: previously this failed to compile)."""
    rng = np.random.default_rng(12)
    B, T, E, H = 2, 4, 512, 1024  # W is 25 MB fp32 > the 12 MB budget
    xs = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32) * 0.1)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.02)
    b = jnp.zeros((4 * H,), jnp.float32)
    z = jnp.zeros((B, H), jnp.float32)
    hs, cf, hf = lstm_scan(xs, W, b, z, z, 1.0, 4, jnp.float32, True)
    hs_r, cf_r, hf_r = lstm_scan_ref(xs, W, b, z, z)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_r), atol=1e-5)

    g = jax.grad(lambda W: jnp.sum(lstm_scan(xs, W, b, z, z, 1.0, 4,
                                             jnp.float32, True)[0] ** 2))(W)
    gr = jax.grad(lambda W: jnp.sum(lstm_scan_ref(xs, W, b, z, z)[0] ** 2))(W)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)


def test_project_candidates_dsoftmax_matches_dense():
    from jlm_tpu.config import Config, DSoftmaxConfig
    from jlm_tpu.ops.project import project_candidates_dsoftmax

    rng = np.random.default_rng(7)
    B, H = 8, 64
    cfg = Config(
        vocab_size=768, embed_size=32, hidden_size=H, head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(256, 256, 256), block_dims=(64, 32, 16), mode="prefix"
        ),
    )
    blocks = [
        {"W": jnp.asarray(rng.normal(size=(d, s)).astype(np.float32) * 0.1),
         "b": jnp.asarray(rng.normal(size=(s,)).astype(np.float32) * 0.01)}
        for s, d in zip(cfg.dsoftmax.block_sizes, cfg.dsoftmax.block_dims)
    ]
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    cand = jnp.asarray([0, 255, 256, 511, 512, 767, 100], jnp.int32)
    out = project_candidates_dsoftmax(h, blocks, cfg, cand, tile_v=256,
                                      interpret=True)
    # dense reference: zero-pad each block W up to H rows (prefix slices)
    dense = jnp.concatenate(
        [jnp.pad(b["W"], ((0, H - b["W"].shape[0]), (0, 0))) for b in blocks],
        axis=1,
    )
    bias = jnp.concatenate([b["b"] for b in blocks])
    ref = project_candidates_ref(h, dense, None, bias, cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_project_candidates_dsoftmax_int8():
    from jlm_tpu.config import Config, DSoftmaxConfig
    from jlm_tpu.ops.project import project_candidates_dsoftmax

    rng = np.random.default_rng(8)
    B, H = 8, 64
    cfg = Config(
        vocab_size=512, embed_size=32, hidden_size=H, head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(256, 256), block_dims=(64, 32), mode="prefix"
        ),
    )
    blocks_f = [
        {"W": rng.normal(size=(d, s)).astype(np.float32) * 0.1,
         "b": rng.normal(size=(s,)).astype(np.float32) * 0.01}
        for s, d in zip(cfg.dsoftmax.block_sizes, cfg.dsoftmax.block_dims)
    ]
    blocks_q = [
        {"W": quantize_weight(b["W"], axis=0), "b": jnp.asarray(b["b"])}
        for b in blocks_f
    ]
    h = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    cand = jnp.asarray([0, 100, 300, 511], jnp.int32)
    out = project_candidates_dsoftmax(h, blocks_q, cfg, cand, tile_v=256,
                                      interpret=True)
    dense = jnp.concatenate(
        [jnp.pad(
            jnp.asarray(b["W"]["q"].astype(np.float32) * b["W"]["scale"][None, :]),
            ((0, H - b["W"]["q"].shape[0]), (0, 0)))
         for b in blocks_q],
        axis=1,
    )
    bias = jnp.concatenate([jnp.asarray(b["b"]) for b in blocks_f])
    ref = project_candidates_ref(h, dense, None, bias, cand)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


# ---------------------------------------------------------------------------
# Fused softmax cross-entropy kernel
# ---------------------------------------------------------------------------

from jlm_tpu.ops.softmax_ce import ce_loss_fused, ce_loss_ref


@pytest.mark.parametrize("B,D,V", [(16, 128, 1000), (32, 256, 4096)])
def test_ce_fused_forward(B, D, V):
    rng = np.random.default_rng(21)
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    y = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    out = ce_loss_fused(h, W, b, y, 512, jnp.float32, True)
    ref = ce_loss_ref(h, W, b, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_ce_fused_grads_match_ref():
    rng = np.random.default_rng(22)
    B, D, V = 24, 128, 1000  # V not a tile multiple: exercises padding
    h = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, V)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(V,)).astype(np.float32) * 0.01)
    y = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    gw = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    def loss_k(h, W, b):
        return jnp.sum(ce_loss_fused(h, W, b, y, 512, jnp.float32, True) * gw)

    def loss_r(h, W, b):
        return jnp.sum(ce_loss_ref(h, W, b, y) * gw)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(h, W, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(h, W, b)
    for k, r, name in zip(gk, gr, ["h", "W", "b"]):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), atol=1e-4, rtol=1e-4,
            err_msg=f"CE grad mismatch for {name}",
        )


def test_ce_fused_dsoftmax_matches_ref():
    """D-softmax fused CE (per-block kernels + merged partial lse) ==
    plain CE over the segmented logits, loss AND grads (VERDICT r3 #7:
    config-5's 100k D-softmax head previously had no fused-CE path)."""
    from jlm_tpu.config import Config, DSoftmaxConfig
    from jlm_tpu.models.heads import full_softmax_loss
    from jlm_tpu.models.params import init_params
    from jlm_tpu.ops.softmax_ce import ce_loss_fused_dsoftmax

    for mode in ("prefix", "disjoint"):
        cfg = Config(
            vocab_size=768, embed_size=32, hidden_size=64, head="dsoftmax",
            dsoftmax=DSoftmaxConfig(
                block_sizes=(128, 256, 384),
                block_dims=(64, 32, 16) if mode == "prefix" else (32, 16, 16),
                mode=mode,
            ),
            fused_ce=True, seed=3,
        )
        params = jax.tree.map(jnp.asarray, init_params(cfg))
        rng = np.random.default_rng(31)
        B, T = 4, 6
        hs = jnp.asarray(rng.normal(size=(B, T, 64)).astype(np.float32) * 0.3)
        # targets spanning all three blocks incl. boundaries
        tgt = jnp.asarray(
            rng.integers(0, 768, (B, T)).astype(np.int32)
        ).at[0, :4].set(jnp.asarray([0, 127, 128, 767]))

        def fused(p):
            return full_softmax_loss(p, cfg, hs, tgt, precision="highest")

        cfg_ref = cfg.replace(fused_ce=False)

        def ref(p):
            return full_softmax_loss(p, cfg_ref, hs, tgt, precision="highest")

        np.testing.assert_allclose(
            float(fused(params)), float(ref(params)), rtol=1e-5, atol=1e-5,
            err_msg=mode,
        )
        gk = jax.grad(fused)(params)
        gr = jax.grad(ref)(params)
        for k, blk in enumerate(gk["head"]["blocks"]):
            np.testing.assert_allclose(
                np.asarray(blk["W"]),
                np.asarray(gr["head"]["blocks"][k]["W"]),
                atol=1e-4, rtol=1e-4, err_msg=f"{mode} dW block {k}",
            )
            np.testing.assert_allclose(
                np.asarray(blk["b"]),
                np.asarray(gr["head"]["blocks"][k]["b"]),
                atol=1e-4, rtol=1e-4, err_msg=f"{mode} db block {k}",
            )
        gh_k = jax.grad(lambda x: full_softmax_loss(
            params, cfg, x, tgt, precision="highest"))(hs)
        gh_r = jax.grad(lambda x: full_softmax_loss(
            params, cfg_ref, x, tgt, precision="highest"))(hs)
        np.testing.assert_allclose(
            np.asarray(gh_k), np.asarray(gh_r), atol=1e-4, rtol=1e-4,
            err_msg=f"{mode} dh",
        )


@pytest.mark.parametrize("R,E,H,dtype", [
    (48, 64, 96, jnp.float32),
    (48, 64, 96, jnp.bfloat16),
])
def test_lstm_cell_step(R, E, H, dtype):
    """Fused decode-cell kernel vs the jnp reference cell."""
    from jlm_tpu.ops.lstm_cell import lstm_cell_ref, lstm_cell_step

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32) * 0.3)
    h = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.3)
    c = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.3)
    W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.01)
    c2, h2 = lstm_cell_step(x, h, c, W, b, 1.0, compute_dtype=dtype,
                            interpret=True)
    c_ref, h_ref = lstm_cell_ref(x, h, c, W, b, 1.0)
    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_ref), atol=atol)
    np.testing.assert_allclose(np.asarray(h2, np.float32),
                               np.asarray(h_ref), atol=atol)


def test_cell_cand_fused():
    """Fused cell+candidate frame kernel == cell ref + einsum ref, at both
    beam-pad row counts (10 = flagship, 8 = tiny-config minimum)."""
    from jlm_tpu.ops.frame_step import cell_cand_ref, cell_cand_step

    rng = np.random.default_rng(21)
    for S, B, E, H, C1 in [(12, 10, 64, 128, 17), (4, 8, 32, 64, 9)]:
        R = S * B
        x = jnp.asarray(rng.normal(size=(R, E)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.1)
        c = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32) * 0.1)
        W = jnp.asarray(rng.normal(size=(E + H, 4 * H)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(4 * H,)).astype(np.float32) * 0.01)
        cols = jnp.asarray(rng.normal(size=(S, C1, H)).astype(np.float32) * 0.1)
        cbias = jnp.asarray(rng.normal(size=(S, C1)).astype(np.float32) * 0.01)
        c_k, h_k, cand_k = cell_cand_step(
            x, h, c, W, b, cols, cbias, B, 1.0, interpret=True
        )
        c_r, h_r, cand_r = cell_cand_ref(x, h, c, W, b, cols, cbias, B, 1.0)
        np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r), atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(cand_k), np.asarray(cand_r), atol=1e-4
        )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_cand_dot(dtype):
    """Per-sentence candidate-scoring kernel vs the einsum reference."""
    from jlm_tpu.ops.cand_dot import cand_dot, cand_dot_ref

    rng = np.random.default_rng(11)
    S, B, C1, H = 12, 10, 65, 128  # deliberately non-multiple of gs
    h3 = jnp.asarray(rng.normal(size=(S, B, H)).astype(np.float32) * 0.3,
                     dtype)
    cols = jnp.asarray(rng.normal(size=(S, C1, H)).astype(np.float32) * 0.3,
                       dtype)
    bias = jnp.asarray(rng.normal(size=(S, C1)).astype(np.float32) * 0.1)
    out = cand_dot(h3, cols, bias, gs=8, interpret=True)
    ref = cand_dot_ref(h3, cols, bias)
    atol = 1e-4 if dtype == jnp.float32 else 0.15
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_topk_stable_exact_vs_lax():
    """topk_stable('argmax') == lax.top_k bit-for-bit, incl. tie order
    (ascending index within a tie group) and NEG-masked slots — the
    parity-frozen beam prune rule (VERDICT r4 weak #1 lever)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jlm_tpu.decoder.engine import topk_stable

    rng = np.random.default_rng(0)
    # heavy ties: quantized values + NEG padding like real ext scores
    x = rng.integers(0, 6, (64, 640)).astype(np.float32)
    x[rng.random((64, 640)) < 0.3] = -1e30
    xj = jnp.asarray(x)
    for k in (1, 4, 10):
        v_a, i_a = jax.jit(lambda a, k=k: topk_stable(a, k, "argmax"))(xj)
        v_s, i_s = jax.lax.top_k(xj, k)
        np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_s))
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_s))
