"""Device-resident beam-Viterbi decoding.

TPU-first re-design of the reference's decode loop (ref:
JLM:decoder/decoder.py ``Decoder.decode`` — SURVEY.md §4.6, §5.4).  The
reference interleaves Python lattice bookkeeping with one numpy LM call per
frame; a literal port would pay a host↔device round trip per frame
(SURVEY.md §9.3.1 ranks this the #1 hard part).  Here the ENTIRE search is
one jitted ``lax.scan`` over frames:

- the lattice is encoded host-side as static-shape padded tensors
  (:mod:`jlm_tpu.decoder.lattice`);
- beams, LSTM states, and per-position forward caches live in device
  arrays indexed by kana position;
- each scan step does: gather cached candidate log-probs → score all
  (node × path) extensions → masked ``lax.top_k`` prune → gather surviving
  states → ONE batched LM forward for the new beam;
- only compact backpointer arrays return to the host, which walks them to
  recover surfaces.

Parity with the numpy oracle is exact in fp32 because both use the same
cached-forward formulation, extension enumeration order (node-major,
path-minor — the flat index is ``n * B + p``), stable top-k tie-breaking
(``lax.top_k`` prefers lower flat indices on ties), and max-subtracted
log-softmax.

The LM forward is pluggable (``forward_fn``) so the full-softmax jnp head,
the D-softmax head, the Pallas int8 kernel, and the vocab-sharded
``shard_map`` head all drive the same search skeleton.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jlm_tpu.config import Config, EOS_ID
from jlm_tpu.data.corpus import Vocab
from jlm_tpu.data.lexicon import Lexicon
from jlm_tpu.decoder.lattice import Lattice, build_lattice
from jlm_tpu.models.lstm import initial_state, step_logp
from jlm_tpu.oracle.decoder import DecodeResult

# forward_fn(params, word_ids[B], state, cand_words[C]) ->
#     (cand_logp[B, C], eos_logp[B], new_state)
ForwardFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray, Any]]


def full_softmax_forward(
    params, config: Config, word_ids, state, cand_words, precision="highest"
):
    """Reference forward: full [B, V] log-softmax then candidate gather."""
    logp, state = step_logp(params, config, word_ids, state, precision)
    return logp[:, cand_words], logp[:, EOS_ID], state


def _decode_scan(
    params,
    node_word,  # int32 [T_max, N]
    node_start,  # int32 [T_max, N]
    node_mask,  # bool  [T_max, N]
    node_cand_idx,  # int32 [T_max, N]
    lookahead_words,  # int32 [T_max + 1, C]
    lookahead_mask,  # bool  [T_max + 1, C]
    length,  # int32 scalar (T)
    *,
    config: Config,
    forward_fn: ForwardFn,
):
    T_max = config.max_kana_len
    B = config.beam_pad
    C = config.max_lookahead
    L, H = config.num_layers, config.hidden_size
    NEG = jnp.float32(-1e30)

    # --- position-0 root beam: path 0 alive, fed <eos> from zero state ---
    c0, h0 = initial_state(config, B)
    cand0, eos0, (c1, h1) = forward_fn(
        params, jnp.full((B,), EOS_ID, jnp.int32), (c0, h0), lookahead_words[0]
    )
    cand0 = jnp.where(lookahead_mask[0][None, :], cand0, NEG)

    score = jnp.full((T_max + 1, B), NEG).at[0, 0].set(0.0)
    cand_cache = jnp.zeros((T_max + 1, B, C), jnp.float32).at[0].set(cand0)
    eos_cache = jnp.zeros((T_max + 1, B), jnp.float32).at[0].set(eos0)
    c_cache = jnp.zeros((T_max + 1, L, B, H), jnp.float32).at[0].set(c1)
    h_cache = jnp.zeros((T_max + 1, L, B, H), jnp.float32).at[0].set(h1)

    def step(carry, xs):
        score, cand_cache, eos_cache, c_cache, h_cache = carry
        pos, words, starts, mask, cand_idx, look_w, look_m = xs

        # Extension scores [N, B]: cached logp of each node's word from each
        # path of the beam at the node's start position.
        cand_rows = cand_cache[starts]  # [N, B, C]
        ext_logp = jnp.take_along_axis(
            cand_rows, cand_idx[:, None, None], axis=2
        )[:, :, 0]
        ext = score[starts] + ext_logp  # [N, B]
        ext = jnp.where(mask[:, None], ext, NEG)

        # Stable top-k over the flat (node-major, path-minor) enumeration.
        # Slots beyond the true beam width are padding: force them dead so
        # the padded beam is exactly the reference's width-``beam_width``
        # beam (parity even when beam_width < beam_pad).
        top_scores, top_idx = jax.lax.top_k(ext.reshape(-1), B)
        slot_alive = jnp.arange(B) < config.beam_width
        top_scores = jnp.where(slot_alive, top_scores, NEG)
        sel_n = top_idx // B
        sel_p = top_idx % B
        src_pos = starts[sel_n]  # [B]
        new_words = words[sel_n]  # [B]

        # Gather surviving LSTM states: [B, L, H] → [L, B, H].
        new_c = jnp.moveaxis(c_cache[src_pos, :, sel_p, :], 0, 1)
        new_h = jnp.moveaxis(h_cache[src_pos, :, sel_p, :], 0, 1)

        # One batched LM forward for the finalized beam.
        cand_new, eos_new, (c_new, h_new) = forward_fn(
            params, new_words, (new_c, new_h), look_w
        )
        cand_new = jnp.where(look_m[None, :], cand_new, NEG)
        # Dead beam slots (score -inf) must stay -inf when extended.
        alive = top_scores > NEG / 2
        cand_new = jnp.where(alive[:, None], cand_new, NEG)

        score = score.at[pos].set(top_scores)
        cand_cache = cand_cache.at[pos].set(cand_new)
        eos_cache = eos_cache.at[pos].set(eos_new)
        c_cache = c_cache.at[pos].set(c_new)
        h_cache = h_cache.at[pos].set(h_new)
        return (
            (score, cand_cache, eos_cache, c_cache, h_cache),
            (src_pos, sel_p, sel_n),
        )

    xs = (
        jnp.arange(1, T_max + 1),
        node_word,
        node_start,
        node_mask,
        node_cand_idx,
        lookahead_words[1:],
        lookahead_mask[1:],
    )
    carry = (score, cand_cache, eos_cache, c_cache, h_cache)
    (score, cand_cache, eos_cache, c_cache, h_cache), bp = jax.lax.scan(
        step, carry, xs
    )
    bp_src, bp_p, bp_n = bp  # each [T_max, B]

    # Final <eos> rescoring at the true length T (SURVEY.md §4.6).
    final = score[length] + eos_cache[length]
    return {
        "final": final,  # [B]
        "score": score,  # [T_max+1, B]
        "bp_src": bp_src,
        "bp_p": bp_p,
        "bp_n": bp_n,
    }


class BeamDecoder:
    """Host wrapper: lattice build → one device call → backpointer walk.

    Mirrors the reference's ``Decoder`` API (``decode(kana, top_n)``) while
    keeping every per-frame operation on device.
    """

    def __init__(
        self,
        params,
        lexicon: Lexicon,
        vocab: Vocab,
        config: Config,
        forward_fn: Optional[ForwardFn] = None,
        precision: str = "highest",
    ):
        self.params = params
        self.lexicon = lexicon
        self.vocab = vocab
        self.config = config
        if forward_fn is None:
            fwd = lambda p, w, s, cw: full_softmax_forward(
                p, config, w, s, cw, precision=precision
            )
        else:
            fwd = forward_fn
        self._decode_jit = jax.jit(
            functools.partial(_decode_scan, config=config, forward_fn=fwd)
        )
        self._decode_vmapped = jax.jit(
            jax.vmap(
                functools.partial(_decode_scan, config=config, forward_fn=fwd),
                in_axes=(None,) + (0,) * 7,
            ),
            static_argnums=(),
        )

    def _device_pass(self, lattice: Lattice) -> Dict[str, np.ndarray]:
        out = self._decode_jit(
            self.params,
            node_word=jnp.asarray(lattice.node_word),
            node_start=jnp.asarray(lattice.node_start),
            node_mask=jnp.asarray(lattice.node_mask),
            node_cand_idx=jnp.asarray(lattice.node_cand_idx),
            lookahead_words=jnp.asarray(lattice.lookahead_words),
            lookahead_mask=jnp.asarray(lattice.lookahead_mask),
            length=jnp.int32(lattice.length),
        )
        return jax.tree.map(np.asarray, out)

    def _backtrack(
        self, lattice: Lattice, out: Dict[str, np.ndarray], beam: int
    ) -> List[Tuple[str, int]]:
        segs: List[Tuple[str, int]] = []
        pos, b = lattice.length, beam
        while pos > 0:
            n = int(out["bp_n"][pos - 1, b])
            node = lattice.frames[pos][n]
            segs.append((node.display, node.word_id))
            pos, b = int(out["bp_src"][pos - 1, b]), int(out["bp_p"][pos - 1, b])
        segs.reverse()
        return segs

    def results_from_output(
        self, lattice: Lattice, out: Dict[str, np.ndarray], n_best: int
    ) -> List[DecodeResult]:
        final = out["final"]
        order = np.argsort(-final, kind="stable")[:n_best]
        results = []
        for b in order:
            if final[b] <= -1e29:
                continue
            segs = self._backtrack(lattice, out, int(b))
            results.append(
                DecodeResult(
                    surface="".join(d for d, _ in segs),
                    score=float(final[b]),
                    segments=segs,
                )
            )
        return results

    def decode(self, kana: str, n_best: int = 1) -> List[DecodeResult]:
        lattice = build_lattice(kana, self.lexicon, self.vocab, self.config)
        out = self._device_pass(lattice)
        return self.results_from_output(lattice, out, n_best)

    def decode_batch(
        self, kanas: List[str], n_best: int = 1
    ) -> List[List[DecodeResult]]:
        """Streaming batched conversion: S independent lattices in one call.

        The vmapped scan is the data-parallel unit; under a mesh the leading
        axis shards over the ``data`` axis (SURVEY.md §3.3, BASELINE
        config 5).
        """
        lattices = [
            build_lattice(k, self.lexicon, self.vocab, self.config) for k in kanas
        ]
        stack = lambda name: jnp.asarray(
            np.stack([getattr(l, name) for l in lattices])
        )
        out = self._decode_vmapped(
            self.params,
            stack("node_word"),
            stack("node_start"),
            stack("node_mask"),
            stack("node_cand_idx"),
            stack("lookahead_words"),
            stack("lookahead_mask"),
            jnp.asarray([l.length for l in lattices], jnp.int32),
        )
        out = jax.tree.map(np.asarray, out)
        return [
            self.results_from_output(
                lattices[i], jax.tree.map(lambda a: a[i], out), n_best
            )
            for i in range(len(lattices))
        ]
