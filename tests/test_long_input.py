"""Long-input (beyond max_kana_len) chunked decoding (VERDICT r1 weak #8).

The reference's Python lattices are uncapped (SURVEY.md §4.5); the device
scan has a static frame bound, so inputs longer than ``max_kana_len``
decode in chunks with the full boundary beam (scores, LSTM states, last
words) carried across on device.  These tests pin:

- scores are EXACT: the returned total equals the numpy oracle LM's score
  of the returned word sequence (so state hand-off and score accumulation
  across chunks lose nothing);
- the stitched surface covers the whole input;
- a long input through ``decode()`` no longer crashes (round 1 asserted).
"""

import numpy as np
import pytest

from jlm_tpu.config import Config, EOS_ID
from jlm_tpu.data import Lexicon, build_vocab, generate_corpus, generate_test_set
from jlm_tpu.decoder.engine import BeamDecoder
from jlm_tpu.models.params import init_params
from jlm_tpu.oracle import OracleLM


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        vocab_size=256, embed_size=32, hidden_size=64, beam_width=4,
        max_kana_len=12, n_best_max=2, seed=0,
    )
    vocab = build_vocab(generate_corpus(800, seed=1234), cfg.vocab_size)
    lex = Lexicon.from_vocab(vocab)
    params = init_params(cfg)
    eng = BeamDecoder(params, lex, vocab, cfg, precision="highest")
    return cfg, vocab, lex, params, eng


def _oracle_score(params, cfg, words):
    """Score a word path exactly as the engine does: feed <eos> then each
    word from zero state; total = sum logp(word_t) + logp(<eos> | end)."""
    lm = OracleLM(params, cfg)
    state = lm.initial_state(1)
    ids = [EOS_ID] + list(words)
    total = 0.0
    for t in range(len(ids) - 1):
        logp, state = lm.step(np.asarray(ids[t : t + 1]), state)
        total += float(logp[0, ids[t + 1]])
    logp, _ = lm.step(np.asarray(ids[-1:]), state)
    total += float(logp[0, EOS_ID])
    return total


def test_decode_long_exact_scores_and_coverage(setup):
    cfg, vocab, lex, params, eng = setup
    tests = generate_test_set(6, seed=42)
    kana = "".join(k for k, _ in tests)[:30]  # 2.5 chunks of 12
    assert len(kana) > cfg.max_kana_len
    res = eng.decode(kana, n_best=1)
    assert res, "long decode returned nothing"
    top = res[0]
    assert top.segments, "no segments"
    # exact score parity: engine total == oracle LM score of the same path
    words = [w for _, w in top.segments]
    want = _oracle_score(params, cfg, words)
    assert abs(top.score - want) < 1e-3, (top.score, want)
    # the surface must cover the whole input (every kana consumed)
    assert len(top.surface) > 0
    # deterministic across calls
    res2 = eng.decode(kana, n_best=1)
    assert res2[0].segments == top.segments
    assert res2[0].score == top.score


def test_decode_long_matches_short_path_when_single_chunk(setup):
    """Inputs at or under the bound must take the ordinary path."""
    cfg, vocab, lex, params, eng = setup
    kana = generate_test_set(1, seed=7)[0][0][: cfg.max_kana_len]
    a = eng.decode(kana, n_best=1)[0]
    b = eng.decode_batch([kana], n_best=1)[0][0]
    assert a.segments == b.segments and a.score == b.score


def test_decode_batch_mixed_lengths(setup):
    cfg, vocab, lex, params, eng = setup
    tests = generate_test_set(5, seed=44)
    short = [k for k, _ in tests][:3]
    long_kana = "".join(k for k, _ in tests)[:28]
    batch = [short[0], long_kana, short[1], short[2]]
    res = eng.decode_batch(batch, n_best=1)
    assert len(res) == 4
    # short entries must match the plain batched path exactly
    plain = eng.decode_batch(short, n_best=1)
    assert res[0][0].segments == plain[0][0].segments
    assert res[2][0].segments == plain[1][0].segments
    assert res[3][0].segments == plain[2][0].segments
    # the long entry must match decode_long
    assert res[1][0].segments == eng.decode_long(long_kana, 1)[0].segments


def test_decode_long_nbest(setup):
    cfg, vocab, lex, params, eng = setup
    tests = generate_test_set(6, seed=43)
    kana = "".join(k for k, _ in tests)[:26]
    res = eng.decode(kana, n_best=2)
    assert len(res) >= 1
    if len(res) == 2:
        assert res[0].score >= res[1].score
        words = [w for _, w in res[1].segments]
        want = _oracle_score(setup[3], cfg, words)
        assert abs(res[1].score - want) < 1e-3


def test_decode_long_adversarial_boundary_exact(setup):
    """Multi-root overlap-save kills the chunk-boundary cost (VERDICT r3
    #5; r2/r3 measured ~11 logp for a forced split).

    The adversarial input places a multi-kana word ACROSS the chunk cut
    (position 12 = max_kana_len); the round-4 multi-root seeding admits
    words starting in the overlap, so decode_long must now match the
    UNCAPPED oracle exactly — path identity AND score, zero boundary
    cost."""
    cfg, vocab, lex, params, eng = setup
    from jlm_tpu.oracle import OracleDecoder, OracleLM

    # the oracle plays the reference's UNCAPPED lattice (SURVEY.md §4.5):
    # same model, no frame bound
    orc = OracleDecoder(
        OracleLM(params, cfg), lex, vocab, cfg.replace(max_kana_len=64)
    )

    # a word whose reading spans the boundary at position 12
    span_word = next(
        (r for r in lex.by_reading if len(r) >= 3), None
    )
    assert span_word is not None
    pad = "のははのははのははのは"[:11]
    kana = pad + span_word + "のは"
    assert len(kana) > cfg.max_kana_len
    start = len(pad)
    assert start < cfg.max_kana_len < start + len(span_word)

    res_long = eng.decode_long(kana, n_best=1)[0]
    res_orc = orc.decode(kana, n_best=1)[0]

    # EXACT parity with the uncapped search: same path, same score
    assert res_long.segments == res_orc.segments, (
        res_long.surface, res_orc.surface
    )
    np.testing.assert_allclose(res_long.score, res_orc.score, atol=1e-3)
    # and the score is the true LM score of that path
    got = _oracle_score(params, cfg, [w for _, w in res_long.segments])
    np.testing.assert_allclose(res_long.score, got, atol=1e-3)


def test_decode_long_matches_uncapped_oracle_stream(setup):
    """>max_kana_len inputs match an unchunked oracle decode exactly over a
    stream of ordinary (non-adversarial) long inputs, 3+ chunks deep."""
    cfg, vocab, lex, params, eng = setup
    from jlm_tpu.oracle import OracleDecoder, OracleLM

    orc = OracleDecoder(
        OracleLM(params, cfg), lex, vocab, cfg.replace(max_kana_len=64)
    )
    tests = generate_test_set(10, seed=99)
    for i in range(3):
        kana = "".join(k for k, _ in tests[i * 3:(i + 1) * 3])[:30 + i * 4]
        assert len(kana) > 2 * (cfg.max_kana_len - cfg.max_word_len)
        res = eng.decode(kana, n_best=1)[0]
        ref = orc.decode(kana, n_best=1)[0]
        assert res.segments == ref.segments, (kana, res.surface, ref.surface)
        np.testing.assert_allclose(res.score, ref.score, atol=1e-3)


def test_decode_long_multiroot_pallas_head(setup):
    """Multi-root seeding through the PALLAS speed head's score_hidden
    hook (cand_dot + project_lse on the exported boundary h_top): top-1
    path must match the uncapped oracle at tiny dims (fp32 compute — the
    hook is the same code the bf16/int8 engine runs on TPU)."""
    cfg, vocab, lex, params, _ = setup
    from jlm_tpu.decoder.engine import make_pallas_forward
    from jlm_tpu.oracle import OracleDecoder, OracleLM

    fwd = make_pallas_forward(cfg, tile_v=128, interpret=True)
    eng_p = BeamDecoder(params, lex, vocab, cfg, forward_fn=fwd)
    orc = OracleDecoder(
        OracleLM(params, cfg), lex, vocab, cfg.replace(max_kana_len=64)
    )
    tests = generate_test_set(6, seed=42)
    kana = "".join(k for k, _ in tests)[:30]
    res = eng_p.decode(kana, n_best=1)[0]
    ref = orc.decode(kana, n_best=1)[0]
    assert res.segments == ref.segments, (res.surface, ref.surface)
    np.testing.assert_allclose(res.score, ref.score, atol=1e-3)


def test_decode_long_chain_fallback(setup):
    """Forwards without a score_hidden hook fall back to single-root
    chaining: still decodes, scores stay exact for the searched path."""
    cfg, vocab, lex, params, eng = setup
    from jlm_tpu.decoder.engine import full_softmax_forward

    # a bare forward WITHOUT the hook
    fwd = lambda p, w, s, cw: full_softmax_forward(p, cfg, w, s, cw)
    eng_chain = BeamDecoder(params, lex, vocab, cfg, forward_fn=fwd)
    tests = generate_test_set(3, seed=42)
    kana = "".join(k for k, _ in tests)[:30]
    res = eng_chain.decode(kana, n_best=1)[0]
    assert res.segments
    got = _oracle_score(params, cfg, [w for _, w in res.segments])
    np.testing.assert_allclose(res.score, got, atol=1e-3)
