"""Vocab-sharded head / top-k / loss vs unsharded references.

Runs on the virtual 8-device CPU mesh (SURVEY.md §6.4).  The load-bearing
property is EXACT equivalence with the unsharded path — including top-k tie
order — because beam parity depends on it (SURVEY.md §9.3.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jlm_tpu.config import Config, DSoftmaxConfig
from jlm_tpu.decoder.engine import BeamDecoder, full_softmax_forward
from jlm_tpu.models import init_params
from jlm_tpu.models.heads import full_softmax_loss
from jlm_tpu.models.lstm import forward_hidden, initial_state
from jlm_tpu.oracle import OracleDecoder, OracleLM
from jlm_tpu.parallel import (
    make_mesh,
    make_sharded_forward,
    shard_params,
    sharded_topk,
    vocab_parallel_nll,
)


def cfg_mesh(**kw):
    base = dict(
        vocab_size=256, embed_size=32, hidden_size=64, beam_width=4,
        max_kana_len=30, mesh_data=2, mesh_vocab=4, seed=42,
    )
    base.update(kw)
    cfg = Config(**base)
    return cfg, make_mesh(cfg)


def test_mesh_axes():
    cfg, mesh = cfg_mesh()
    assert mesh.shape == {"data": 2, "vocab": 4}


def test_sharded_forward_matches_unsharded(tiny_params):
    cfg, mesh = cfg_mesh()
    params = shard_params(jax.tree.map(jnp.asarray, tiny_params), cfg, mesh)
    fwd = make_sharded_forward(mesh, cfg)
    S, B = 2, 2
    words = jnp.asarray([[3, 9], [7, 1]], jnp.int32)
    state = initial_state(cfg, S * B)
    cand = jnp.asarray([[0, 5, 17, 255], [2, 4, 100, 31]], jnp.int32)
    c_s, e_s, st_s = fwd(params, words, state, cand)
    c_r, e_r, st_r = full_softmax_forward(
        jax.tree.map(jnp.asarray, tiny_params), cfg, words, state, cand
    )
    np.testing.assert_allclose(c_s, c_r, atol=1e-5)
    np.testing.assert_allclose(e_s, e_r, atol=1e-5)
    np.testing.assert_allclose(st_s[0], st_r[0], atol=1e-6)


def test_sharded_dsoftmax_forward_matches_unsharded():
    cfg, mesh = cfg_mesh(
        head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(64, 64, 128), block_dims=(64, 32, 16), mode="prefix"
        ),
    )
    params = jax.tree.map(jnp.asarray, init_params(cfg))
    sharded = shard_params(params, cfg, mesh)
    fwd = make_sharded_forward(mesh, cfg)
    S, B = 2, 1
    words = jnp.asarray([[1], [8]], jnp.int32)
    state = initial_state(cfg, S * B)
    # candidates spanning all three blocks incl. boundaries
    cand = jnp.asarray([[0, 63, 64, 127, 128, 255],
                        [255, 128, 127, 64, 63, 0]], jnp.int32)
    c_s, e_s, _ = fwd(sharded, words, state, cand)

    from jlm_tpu.decoder.engine import full_softmax_forward as ref_fwd

    c_r, e_r, _ = ref_fwd(params, cfg, words, state, cand)
    np.testing.assert_allclose(c_s, c_r, atol=1e-5)
    np.testing.assert_allclose(e_s, e_r, atol=1e-5)


def test_sharded_topk_exact_with_ties():
    cfg, mesh = cfg_mesh()
    rng = np.random.default_rng(0)
    # quantize values so cross-shard ties are guaranteed
    logits = rng.integers(0, 8, (3, 256)).astype(np.float32)
    lj = jnp.asarray(logits)
    vals_s, idx_s = sharded_topk(mesh, lj, k=10)
    vals_r, idx_r = jax.lax.top_k(lj, 10)
    np.testing.assert_array_equal(np.asarray(vals_s), np.asarray(vals_r))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_vocab_parallel_nll_and_grads(tiny_params):
    cfg, mesh = cfg_mesh()
    params = jax.tree.map(jnp.asarray, tiny_params)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, (4, 6)).astype(np.int32)
    tgt = rng.integers(0, 256, (4, 6)).astype(np.int32)
    hs, _ = forward_hidden(params, cfg, jnp.asarray(ids), initial_state(cfg, 4),
                           precision="highest")
    loss_fn = vocab_parallel_nll(mesh, cfg, precision="highest")

    sharded = shard_params(params, cfg, mesh)
    l_s = loss_fn(sharded, hs, jnp.asarray(tgt))
    l_r = full_softmax_loss(params, cfg, hs, jnp.asarray(tgt), precision="highest")
    np.testing.assert_allclose(float(l_s), float(l_r), atol=1e-5)

    g_s = jax.grad(lambda p: loss_fn(p, hs, jnp.asarray(tgt)))(sharded)
    g_r = jax.grad(
        lambda p: full_softmax_loss(p, cfg, hs, jnp.asarray(tgt), precision="highest")
    )(params)
    np.testing.assert_allclose(
        np.asarray(g_s["head"]["W"]), np.asarray(g_r["head"]["W"]), atol=1e-5
    )


def test_sharded_decode_top1_parity(tiny_params, lexicon, vocab):
    """BASELINE config 3 skeleton: vocab-sharded beam decode == oracle.

    S must divide mesh_data; decode two sentences per batch on (2, 4)."""
    cfg, mesh = cfg_mesh()
    params = jax.tree.map(jnp.asarray, tiny_params)
    sharded = shard_params(params, cfg, mesh)
    fwd = make_sharded_forward(mesh, cfg)
    eng = BeamDecoder(sharded, lexicon, vocab, cfg, forward_fn=fwd)
    orc = OracleDecoder(OracleLM(tiny_params, cfg), lexicon, vocab, cfg)
    kanas = ["きょうはいいてんき", "あめがふる", "かみとかわ", "はしをみる"]
    res = eng.decode_batch(kanas, n_best=1)
    for kana, r in zip(kanas, res):
        r_o = orc.decode(kana)[0]
        assert r[0].segments == r_o.segments, kana
        assert abs(r[0].score - r_o.score) < 1e-3


def test_seq_pipeline_matches_sequential():
    """Time-block pipeline over a 'seq' mesh == per-microbatch scan.

    The ppermute carry hand-off (overlap-save halo across chips,
    SURVEY.md §7) must be value-exact."""
    import jax
    import numpy as np
    from jlm_tpu.parallel.seq_pipeline import (
        make_seq_pipeline_scan,
        seq_pipeline_ref,
    )

    P_ = 4
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:P_]), ("seq",))
    M, B, T, E, H, L = 8, 2, 16, 16, 16, 2
    rng = np.random.default_rng(11)
    xs = jnp.asarray(rng.normal(size=(M, B, T, E)).astype(np.float32) * 0.2)
    layers = tuple(
        (jnp.asarray(rng.normal(size=((E if l == 0 else H) + H, 4 * H))
                     .astype(np.float32) * 0.1),
         jnp.zeros((4 * H,), jnp.float32))
        for l in range(L)
    )
    c0 = jnp.asarray(rng.normal(size=(M, L, B, H)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.normal(size=(M, L, B, H)).astype(np.float32) * 0.1)

    fn = make_seq_pipeline_scan(mesh, num_layers=L)
    hs, c_f, h_f = fn(xs, layers, c0, h0)
    hs_r, c_r, h_r = seq_pipeline_ref(xs, layers, c0, h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_r), atol=1e-5)
