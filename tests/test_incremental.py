"""Incremental per-keystroke decoder vs batch engine parity (SURVEY.md §4.7)."""

import numpy as np
import pytest

from jlm_tpu.decoder.engine import BeamDecoder
from jlm_tpu.decoder.incremental import IncrementalDecoder
from jlm_tpu.ops.quant import quantize_params


@pytest.fixture(scope="module")
def inc(tiny_params, tiny_config, lexicon, vocab):
    return IncrementalDecoder(tiny_params, lexicon, vocab, tiny_config)


@pytest.fixture(scope="module")
def batch(tiny_params, tiny_config, lexicon, vocab):
    return BeamDecoder(tiny_params, lexicon, vocab, tiny_config)


def test_keystroke_stream_matches_batch(inc, batch):
    """Typing a sentence char by char must end at the batch-decode result,
    and every prefix must equal the batch decode of that prefix."""
    kana = "きょうはいい"
    inc.reset()
    for i, ch in enumerate(kana, 1):
        res = inc.push(ch, n_best=2)
        ref = batch.decode(kana[:i], n_best=2)
        assert [r.segments for r in res] == [r.segments for r in ref], kana[:i]
        np.testing.assert_allclose(
            [r.score for r in res], [r.score for r in ref], atol=1e-3
        )


def test_backspace_then_retype(inc, batch):
    inc.reset()
    for ch in "あめが":
        inc.push(ch)
    inc.pop()
    inc.pop()
    res = inc.push("き")  # now "あき"
    ref = batch.decode("あき")
    assert res[0].segments == ref[0].segments
    assert abs(res[0].score - ref[0].score) < 1e-3
    # continue typing after the edit
    res = inc.push("よ")  # "あきよ"
    ref = batch.decode("あきよ")
    assert res[0].segments == ref[0].segments


def test_reset_clears_session(inc, batch):
    inc.reset()
    inc.push("か")
    inc.reset()
    assert inc.results() == []
    res = inc.push("は")
    ref = batch.decode("は")
    assert res[0].segments == ref[0].segments


def test_incremental_quantized(tiny_params, tiny_config, lexicon, vocab):
    qp = quantize_params(tiny_params)
    inc_q = IncrementalDecoder(qp, lexicon, vocab, tiny_config)
    eng_q = BeamDecoder(qp, lexicon, vocab, tiny_config)
    for ch in "かみと":
        res = inc_q.push(ch)
    ref = eng_q.decode("かみと")
    assert res[0].segments == ref[0].segments
    assert abs(res[0].score - ref[0].score) < 1e-3


def test_dsoftmax_incremental(lexicon, vocab):
    from jlm_tpu.config import Config, DSoftmaxConfig
    from jlm_tpu.models import init_params

    cfg = Config(
        vocab_size=256, embed_size=32, hidden_size=64,
        head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(64, 64, 128), block_dims=(64, 32, 16), mode="prefix"
        ),
        beam_width=4, max_kana_len=30, seed=42,
    )
    params = init_params(cfg)
    inc_d = IncrementalDecoder(params, lexicon, vocab, cfg)
    eng_d = BeamDecoder(params, lexicon, vocab, cfg)
    for ch in "きょうは":
        res = inc_d.push(ch)
    ref = eng_d.decode("きょうは")
    assert res[0].segments == ref[0].segments
    assert abs(res[0].score - ref[0].score) < 1e-3


def test_session_save_resume(tiny_params, tiny_config, lexicon, vocab,
                             tmp_path, batch):
    """A saved mid-sentence session resumes in a fresh decoder and finishes
    identically to an uninterrupted one (SURVEY.md §7 resumable streams)."""
    a = IncrementalDecoder(tiny_params, lexicon, vocab, tiny_config)
    for ch in "きょうは":
        a.push(ch)
    path = str(tmp_path / "session.npz")
    a.save_session(path)

    b = IncrementalDecoder(tiny_params, lexicon, vocab, tiny_config)
    b.load_session(path)
    assert b.kana == "きょうは"
    for ch in "いい":
        res = b.push(ch)
    ref = batch.decode("きょうはいい")
    assert res[0].segments == ref[0].segments
    assert abs(res[0].score - ref[0].score) < 1e-3
    # resumed mid-state results also match
    assert [r.segments for r in b.results(2)] == [
        r.segments for r in batch.decode("きょうはいい", n_best=2)
    ]


def test_export_int8_cli(tiny_params, tiny_config, tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    import export_int8
    from jlm_tpu.train import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path), tiny_params, tiny_config)
    export_int8.main(["--exp", str(tmp_path)])
    qp, cfg = load_checkpoint(str(tmp_path), tag="int8")
    assert qp["embedding"]["q"].dtype.name == "int8"
    assert cfg.vocab_size == tiny_config.vocab_size


def test_speculative_matches_plain(tiny_params, tiny_config, lexicon, vocab,
                                   batch):
    """Speculative lookahead must be result-invisible: hits and misses both
    produce exactly the plain per-keystroke stream (and hits do happen)."""
    spec = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, speculate=4,
    )
    kana = "きょうはいい"
    for i, ch in enumerate(kana, 1):
        res = spec.push(ch, n_best=2)
        ref = batch.decode(kana[:i], n_best=2)
        assert [r.segments for r in res] == [r.segments for r in ref], kana[:i]
        np.testing.assert_allclose(
            [r.score for r in res], [r.score for r in ref], atol=1e-3
        )
    assert spec.spec_hits + spec.spec_misses == len(kana)
    assert spec.spec_hits > 0, "static kana prior never hit in 6 keystrokes"


def test_unified_one_dispatch_per_keystroke(tiny_params, tiny_config, lexicon,
                                            vocab, batch):
    """The round-4 unified speculative step issues exactly ONE device call
    per keystroke — commit + probe + rank + speculate fused (VERDICT r3
    #2; the round-3 design's extra spec dispatch made speculation a net
    loss on tunneled links)."""
    dec = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, speculate=4,
    )
    calls = {"unified": 0, "prime": 0}
    unified, prime = dec._unified, dec._prime_jit

    def count_unified(*a, **k):
        calls["unified"] += 1
        return unified(*a, **k)

    def count_prime(*a, **k):
        calls["prime"] += 1
        return prime(*a, **k)

    dec._unified, dec._prime_jit = count_unified, count_prime
    kana = "きょうはいい"
    for i, ch in enumerate(kana, 1):
        res = dec.push(ch)
        assert res[0].segments == batch.decode(kana[:i])[0].segments
    assert calls["unified"] == len(kana), calls
    assert calls["prime"] == 0, calls  # priming happens at reset/roll/pop


def test_speculative_forced_hit_and_miss(tiny_params, tiny_config, lexicon,
                                         vocab, batch):
    """Pin both paths: a predictor that always includes the next char
    (all hits) and one that never does (all misses)."""
    hit_dec = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, speculate=2,
        next_char_predictor=lambda prefix: ["きょうは"[len(prefix)], "ん"]
        if len(prefix) < 4 else ["ん"],
    )
    for i, ch in enumerate("きょうは", 1):
        res = hit_dec.push(ch)
        assert res[0].segments == batch.decode("きょうは"[:i])[0].segments
    assert hit_dec.spec_hits == 4 and hit_dec.spec_misses == 0

    miss_dec = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, speculate=2,
        next_char_predictor=lambda prefix: ["ん", "を"],
    )
    for i, ch in enumerate("きょう", 1):
        res = miss_dec.push(ch)
        assert res[0].segments == batch.decode("きょう"[:i])[0].segments
    assert miss_dec.spec_hits == 0 and miss_dec.spec_misses == 3


def test_speculative_pop_invalidates(tiny_params, tiny_config, lexicon, vocab,
                                     batch):
    spec = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, speculate=3,
    )
    for ch in "あめが":
        spec.push(ch)
    spec.pop()
    spec.pop()
    res = spec.push("き")  # "あき"
    assert res[0].segments == batch.decode("あき")[0].segments


def test_window_roll_long_session(tiny_params, tiny_config, lexicon, vocab):
    """Typing past max_kana_len rolls the window (commit & continue) instead
    of asserting (VERDICT r1 weak #8).  The post-roll suffix must decode
    exactly like a fresh incremental session rooted at the boundary beam,
    scores staying cumulative, and results must keep the committed prefix."""
    cfg = tiny_config.replace(max_kana_len=6)
    inc = IncrementalDecoder(tiny_params, lexicon, vocab, cfg)
    kana = "きょうはいいあめがふるよ"  # 12 kana = 2 windows of 6
    res = None
    for ch in kana:
        res = inc.push(ch, n_best=1)
    assert inc._base == 6
    top = res[0]
    # committed prefix + window segments must cover all typed kana
    assert top.segments
    # the score is the exact cumulative LM score of the full returned path
    from jlm_tpu.config import EOS_ID
    from jlm_tpu.oracle import OracleLM

    lm = OracleLM(tiny_params, cfg)
    state = lm.initial_state(1)
    ids = [EOS_ID] + [w for _, w in top.segments]
    want = 0.0
    for t in range(len(ids) - 1):
        logp, state = lm.step(np.asarray(ids[t : t + 1]), state)
        want += float(logp[0, ids[t + 1]])
    logp, _ = lm.step(np.asarray(ids[-1:]), state)
    want += float(logp[0, EOS_ID])
    assert abs(top.score - want) < 1e-3

    # popping across the roll boundary must raise cleanly
    for _ in range(6):
        inc.pop()
    with pytest.raises(ValueError):
        inc.pop()


def test_lm_predictor_beats_static(tiny_params, tiny_config, lexicon, vocab):
    """The LM-driven next-kana predictor (prefix trie + cached-beam
    scoring) must beat the prefix-blind static prior on speculation hit
    rate over the fixed typing trace (VERDICT r2 weak #5)."""
    from jlm_tpu.data.synthetic import generate_test_set

    params, config = tiny_params, tiny_config
    tests = generate_test_set(8, seed=777)

    def run(pred):
        from jlm_tpu.decoder.incremental import IncrementalDecoder

        dec = IncrementalDecoder(params, lexicon, vocab, config,
                                 precision="highest", speculate=4,
                                 next_char_predictor=pred)
        for kana, _ in tests:
            dec.reset()
            for ch in kana:
                dec.push(ch)
        return dec.spec_hits / max(1, dec.spec_hits + dec.spec_misses)

    lm, static = run(None), run("static")
    assert lm > static, (lm, static)
    assert lm > 0.25, lm  # untrained floor; trained models measure 0.6-0.8


def test_pallas_lse_keystrokes_match(tiny_params, tiny_config, lexicon,
                                     vocab):
    """VERDICT r4 weak #5: the keystroke step's normalizer through the
    project_lse kernel (interpret mode) — no [rows, V] logits — must match
    the jnp-lse path keystroke for keystroke (fp32 kernel, tiny fp
    reorder only)."""
    inc_p = IncrementalDecoder(
        tiny_params, lexicon, vocab, tiny_config, use_pallas=True
    )
    inc_j = IncrementalDecoder(tiny_params, lexicon, vocab, tiny_config)
    for ch in "きょうはいい":
        rp = inc_p.push(ch, n_best=2)
        rj = inc_j.push(ch, n_best=2)
        assert [r.segments for r in rp] == [r.segments for r in rj]
        np.testing.assert_allclose(
            [r.score for r in rp], [r.score for r in rj], atol=1e-3
        )


def test_pallas_lse_int8_dsoftmax_keystrokes(lexicon, vocab):
    """Same check at the int8 D-softmax head (the config-5 serving shape's
    weight format): per-block kernel calls + merged lse."""
    from jlm_tpu.config import Config, DSoftmaxConfig
    from jlm_tpu.models import init_params

    cfg = Config(
        vocab_size=256, embed_size=32, hidden_size=64, beam_width=4,
        max_kana_len=30, max_nodes_per_frame=16, seed=3,
        head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(64, 64, 128), block_dims=(64, 32, 16), mode="prefix"
        ),
    )
    qp = quantize_params(init_params(cfg))
    inc_p = IncrementalDecoder(qp, lexicon, vocab, cfg, use_pallas=True)
    inc_j = IncrementalDecoder(qp, lexicon, vocab, cfg)
    for ch in "あめがふる":
        rp = inc_p.push(ch, n_best=1)
        rj = inc_j.push(ch, n_best=1)
        assert rp[0].segments == rj[0].segments
        assert abs(rp[0].score - rj[0].score) < 1e-3
