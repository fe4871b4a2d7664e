"""jlm_tpu — a TPU-native kana-kanji conversion engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``jiali-ms/JLM`` (LSTM language model + lattice beam-Viterbi
decoding for real-time Japanese IME conversion; see SURVEY.md for the
full component inventory and behavioral spec of the reference).

Layer map (mirrors SURVEY.md §2, re-designed TPU-first):

- ``jlm_tpu.data``     — corpus prep, frequency vocab, lexicon/reading dict,
                         truncated-BPTT batch reader.       (ref: JLM:data/)
- ``jlm_tpu.oracle``   — pure-numpy CPU reference LM + decoder; defines the
                         golden parity outputs (stands in for the reference's
                         numpy inference engine, JLM:decoder/).
- ``jlm_tpu.models``   — JAX LSTM LM (init/apply pytrees, lax.scan), output
                         heads: full / sampled / D-softmax. (ref: JLM:train/lm.py)
- ``jlm_tpu.ops``      — Pallas TPU kernels: fused LSTM time-block scan,
                         int8-dequant output projection with online logsumexp,
                         quantization.                      (the native layer)
- ``jlm_tpu.decoder``  — lattice construction + device-resident beam-Viterbi
                         (whole search is one lax.scan on device) and the
                         incremental per-keystroke engine.  (ref: JLM:decoder/decoder.py)
- ``jlm_tpu.parallel`` — device mesh, vocab-sharded output head with
                         globally-consistent top-k, multi-host bootstrap.
- ``jlm_tpu.train``    — optax trainer with truncated BPTT, lr decay, grad
                         clip, PPL eval, checkpointing.     (ref: JLM:train/train.py)
- ``jlm_tpu.eval``     — conversion accuracy / latency harness.
"""

__version__ = "0.1.0"
