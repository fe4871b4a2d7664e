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
