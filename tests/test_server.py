"""Multi-session server vs single-session decoders (batched serving parity)."""

import numpy as np
import pytest

from jlm_tpu.config import Config, DSoftmaxConfig
from jlm_tpu.decoder.engine import BeamDecoder
from jlm_tpu.decoder.server import SessionServer
from jlm_tpu.models import init_params
from jlm_tpu.ops.quant import quantize_params


@pytest.fixture(scope="module")
def server(tiny_params, tiny_config, lexicon, vocab):
    return SessionServer(tiny_params, lexicon, vocab, tiny_config,
                         max_sessions=8)


@pytest.fixture(scope="module")
def batch_dec(tiny_params, tiny_config, lexicon, vocab):
    return BeamDecoder(tiny_params, lexicon, vocab, tiny_config)


def test_interleaved_sessions_match_batch(server, batch_dec):
    """Three users typing different sentences, keystrokes interleaved in
    shared device steps — every session must equal its solo decode."""
    texts = ["きょうはいい", "あめがふる", "かみとかわ"]
    sids = [server.open() for _ in texts]
    for t in range(max(len(x) for x in texts)):
        events = [
            (sid, text[t]) for sid, text in zip(sids, texts) if t < len(text)
        ]
        server.push(events)
    for sid, text in zip(sids, texts):
        res = server.results(sid, n_best=2)
        ref = batch_dec.decode(text, n_best=2)
        assert [r.segments for r in res] == [r.segments for r in ref], text
        np.testing.assert_allclose(
            [r.score for r in res], [r.score for r in ref], atol=1e-3
        )
    for sid in sids:
        server.close(sid)


def test_session_reuse_after_close(server, batch_dec):
    sid = server.open()
    for ch in "はし":
        server.push([(sid, ch)])
    server.close(sid)
    sid2 = server.open()
    for ch in "あめ":
        server.push([(sid2, ch)])
    res = server.results(sid2)
    ref = batch_dec.decode("あめ")
    assert res[0].segments == ref[0].segments
    server.close(sid2)


def test_backspace_in_server(server, batch_dec):
    sid = server.open()
    for ch in "きょう":
        server.push([(sid, ch)])
    server.backspace(sid)
    server.push([(sid, "く")])  # きょく
    res = server.results(sid)
    ref = batch_dec.decode("きょく")
    assert res[0].segments == ref[0].segments
    server.close(sid)


def test_single_event_bucket_padding(server, batch_dec):
    """E=1 event pads to the bucket; padding must not corrupt any session."""
    sid_a = server.open()
    sid_b = server.open()
    server.push([(sid_a, "か"), (sid_b, "き")])
    server.push([(sid_a, "み")])  # b idle
    server.push([(sid_b, "く")])
    assert server.results(sid_a)[0].segments == batch_dec.decode("かみ")[0].segments
    assert server.results(sid_b)[0].segments == batch_dec.decode("きく")[0].segments
    server.close(sid_a)
    server.close(sid_b)


def test_server_dsoftmax_int8(lexicon, vocab):
    cfg = Config(
        vocab_size=256, embed_size=32, hidden_size=64,
        head="dsoftmax",
        dsoftmax=DSoftmaxConfig(
            block_sizes=(64, 64, 128), block_dims=(64, 32, 16), mode="prefix"
        ),
        beam_width=4, max_kana_len=30, seed=42,
    )
    qp = quantize_params(init_params(cfg))
    srv = SessionServer(qp, lexicon, vocab, cfg, max_sessions=4)
    eng = BeamDecoder(qp, lexicon, vocab, cfg)
    sid = srv.open()
    for ch in "きょうは":
        srv.push([(sid, ch)])
    assert srv.results(sid)[0].segments == eng.decode("きょうは")[0].segments
