"""Device-resident beam-Viterbi decoding.

TPU-first re-design of the reference's decode loop (ref:
JLM:decoder/decoder.py ``Decoder.decode`` — SURVEY.md §4.6, §5.4).  The
reference interleaves Python lattice bookkeeping with one numpy LM call per
frame; a literal port would pay a host↔device round trip per frame
(SURVEY.md §9.3.1 ranks this the #1 hard part).  Here the ENTIRE search —
for a whole BATCH of independent lattices — is one jitted ``lax.scan``
over frames:

- lattices are packed host-side into ONE ``[S, T_max, N]`` int32 tensor
  (word|start|cand_idx|mask bit-packed) to minimize upload latency; the
  per-position candidate ("lookahead") table is reconstructed on device by
  a single scatter;
- beams, LSTM states, and per-position forward caches live in device
  arrays indexed by (sentence, kana position);
- each scan step: gather cached candidate log-probs → score all
  (node × path) extensions → per-sentence stable ``lax.top_k`` prune →
  flat-index gather of surviving states → ONE batched LM forward over all
  ``S·B`` beam rows (a single MXU-sized matmul);
- backtracking runs on device; only ``[S, K, T_max, 2]`` int16 paths and
  final scores return to the host.

Batched-first matters on TPU: every gather is expressed as
``take_along_axis`` over a leading batch axis (XLA lowers these to fast
batched gathers), never per-sentence ``vmap`` of advanced indexing, which
scalarizes.  ``decode()`` is the S=1 case of ``decode_batch()``.

Parity with the numpy oracle is exact in fp32: same cached-forward
formulation, same extension enumeration order (node-major, path-minor —
flat index ``n·B + p``), same stable top-k tie-break (``lax.top_k``
prefers lower flat indices), same max-subtracted log-softmax.

The LM forward is pluggable (``forward_fn``, batched signature) so the
full-softmax jnp head, the Pallas int8 kernel head, and the vocab-sharded
``shard_map`` head all drive the same search skeleton.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jlm_tpu.config import Config, EOS_ID, UNK_ID
from jlm_tpu.data.corpus import Vocab
from jlm_tpu.data.lexicon import Lexicon
from jlm_tpu.decoder.lattice import Lattice, build_lattice
from jlm_tpu.models.lstm import initial_state, step_logp
from jlm_tpu.oracle.decoder import DecodeResult

# Batched LM forward over all beam rows:
#   forward_fn(params, words [S, B], state (c,h) [L, S*B, H], cand [S, C])
#     -> (cand_logp [S, B, C], eos_logp [S, B], new_state [L, S*B, H])
ForwardFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray, Any]]

# bit-packing layout for the lattice upload (see pack_lattice_batch)
_WORD_BITS = 17  # vocab ids < 131072
_START_SHIFT = 17  # start position: 6 bits (T_max <= 63)
_CIDX_SHIFT = 23  # lookahead column: 6 bits (C_max <= 64)
_MASK_SHIFT = 29


def full_softmax_forward(
    params, config: Config, words, state, cand_words, precision="highest"
):
    """Batched reference forward: full log-softmax then candidate gather."""
    S, B = words.shape
    logp, state = step_logp(params, config, words.reshape(S * B), state, precision)
    lp = logp.reshape(S, B, -1)
    cand_logp = jnp.take_along_axis(
        lp, cand_words[:, None, :], axis=2
    )  # [S, B, C]
    return cand_logp, lp[:, :, EOS_ID], state


def make_pallas_forward(
    config: Config,
    compute_dtype=None,
    interpret: Optional[bool] = None,
    tile_v: int = 2048,
) -> ForwardFn:
    """Batched ForwardFn using the Pallas projection kernel for the head.

    The kernel computes the global logsumexp over vocab tiles with
    in-kernel int8 dequant (never materializing ``[S·B, V]`` logits in
    HBM); candidate logits come from a per-sentence output-column gather
    (:func:`jlm_tpu.models.lstm.candidate_logits` pattern).  ``interpret``
    defaults to True off-TPU so the path stays CPU-testable.
    """
    from jlm_tpu.models.lstm import _w, embed, lstm_step
    from jlm_tpu.ops.project import project_lse

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if compute_dtype is None:
        compute_dtype = jnp.float32

    def forward(params, words, state, cand_words):
        S, B = words.shape
        x = embed(params, words.reshape(S * B))
        h_top, state = lstm_step(params, config, x, state, precision="highest")
        lse = project_lse(
            h_top, params["head"], config,
            tile_v=tile_v, compute_dtype=compute_dtype, interpret=interpret,
        )  # [S*B, 1]
        # candidate + eos raw logits: per-sentence column gather of the head
        ids = jnp.concatenate(
            [cand_words, jnp.full((S, 1), EOS_ID, jnp.int32)], axis=1
        )  # [S, C+1]
        raw = _candidate_logits_batched(params["head"], config, h_top, ids, S, B)
        logp = raw - lse.reshape(S, B, 1)
        return logp[:, :, :-1], logp[:, :, -1], state

    return forward


def _candidate_logits_batched(head, config: Config, h_flat, ids, S, B):
    """Raw logits for per-sentence candidate columns: [S, B, C+1].

    Gathers the needed output-matrix columns (O(C·H) per sentence instead
    of O(V·H)) with int8 dequant on the gathered columns only.
    """
    C1 = ids.shape[1]
    if "blocks" in head:
        ds = config.dsoftmax
        sizes = np.asarray(ds.block_sizes, np.int64)
        bases = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        out = jnp.zeros((S, B, C1), jnp.float32)
        offset = 0
        h3 = h_flat.reshape(S, B, -1)
        for k, blk in enumerate(head["blocks"]):
            d = ds.block_dims[k]
            hs = h3[..., :d] if ds.mode == "prefix" else h3[..., offset:offset + d]
            if ds.mode == "disjoint":
                offset += d
            in_blk = (ids >= bases[k]) & (ids < bases[k] + sizes[k])
            local = jnp.clip(ids - bases[k], 0, sizes[k] - 1)
            W = blk["W"]
            if isinstance(W, dict):
                cols = jnp.take(W["q"], local, axis=1).astype(jnp.float32)
                cols = cols * jnp.take(W["scale"], local)[:, None, :]
            else:
                cols = jnp.take(W, local, axis=1)  # [d, S, C1]
            cols = jnp.moveaxis(cols, 0, -1)  # [S, C1, d]
            vals = jnp.einsum("sbd,scd->sbc", hs, cols) + jnp.take(blk["b"], local)[:, None, :]
            out = jnp.where(in_blk[:, None, :], vals, out)
        return out
    W = head["W"]
    if isinstance(W, dict):
        cols = jnp.take(W["q"], ids, axis=1).astype(jnp.float32)  # [H, S, C1]
        cols = cols * jnp.take(W["scale"], ids)[None, :, :]
    else:
        cols = jnp.take(W, ids, axis=1)  # [H, S, C1]
    cols = jnp.moveaxis(cols, 0, -1)  # [S, C1, H]
    h3 = h_flat.reshape(S, B, -1)
    return jnp.einsum("sbh,sch->sbc", h3, cols) + jnp.take(head["b"], ids)[:, None, :]


def pack_lattice_batch(lattices: List[Lattice]) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-pack node tensors of a lattice batch into one int32 array.

    Layout per node: ``word | start<<17 | cand_idx<<23 | mask<<29`` — a
    single ``[S, T_max, N]`` upload instead of six tensors (the host link
    has ~200 ms fixed latency per transfer; SURVEY.md §9.3.1).
    """
    words = np.stack([l.node_word for l in lattices]).astype(np.int64)
    starts = np.stack([l.node_start for l in lattices]).astype(np.int64)
    cidx = np.stack([l.node_cand_idx for l in lattices]).astype(np.int64)
    mask = np.stack([l.node_mask for l in lattices]).astype(np.int64)
    assert words.max(initial=0) < (1 << _WORD_BITS), "vocab too large to pack"
    assert starts.max(initial=0) < 64 and cidx.max(initial=0) < 64
    packed = words | (starts << _START_SHIFT) | (cidx << _CIDX_SHIFT) | (
        mask << _MASK_SHIFT
    )
    lengths = np.asarray([l.length for l in lattices], np.int32)
    return packed.astype(np.int32), lengths


def _unpack_lattice(packed, config: Config):
    """Device-side unpack + lookahead-table reconstruction (one scatter)."""
    T_max = packed.shape[1]
    C = config.max_lookahead
    word = packed & ((1 << _WORD_BITS) - 1)
    start = (packed >> _START_SHIFT) & 0x3F
    cidx = (packed >> _CIDX_SHIFT) & 0x3F
    mask = ((packed >> _MASK_SHIFT) & 1) == 1

    S = packed.shape[0]
    flat_pos = start * C + cidx
    oob = (T_max + 1) * C  # out-of-bounds => dropped by the scatter
    flat_pos = jnp.where(mask, flat_pos, oob)
    s_idx = jnp.broadcast_to(
        jnp.arange(S)[:, None, None], packed.shape
    )
    look_flat = jnp.full((S, (T_max + 1) * C), -1, jnp.int32)
    look_flat = look_flat.at[s_idx, flat_pos].set(word, mode="drop")
    look_w = look_flat.reshape(S, T_max + 1, C)
    look_m = look_w >= 0
    look_w = jnp.maximum(look_w, 0)
    return word, start, cidx, mask, look_w, look_m


def _decode_scan(
    params,
    packed,  # int32 [S, T_max, N] (pack_lattice_batch)
    lengths,  # int32 [S]
    *,
    config: Config,
    forward_fn: ForwardFn,
):
    # T_max here is the BATCH's bucketed time bound (<= config.max_kana_len):
    # short inputs scan far fewer frames than the global static maximum.
    S, T_max, N = packed.shape
    B = config.beam_pad
    C = config.max_lookahead
    L, H = config.num_layers, config.hidden_size
    NEG = jnp.float32(-1e30)

    word, start, cidx, mask, look_w, look_m = _unpack_lattice(packed, config)

    # --- position-0 root beam: path 0 alive, fed <eos> from zero state ---
    c0 = jnp.zeros((L, S * B, H), jnp.float32)
    h0 = jnp.zeros((L, S * B, H), jnp.float32)
    cand0, eos0, (c1, h1) = forward_fn(
        params, jnp.full((S, B), EOS_ID, jnp.int32), (c0, h0), look_w[:, 0]
    )
    cand0 = jnp.where(look_m[:, 0][:, None, :], cand0, NEG)

    # caches indexed [S, pos, ...]; states stored as [S, pos, B, L, H] so a
    # single flat (pos*B + path) take_along_axis gathers survivors.
    score = jnp.full((S, T_max + 1, B), NEG).at[:, 0, 0].set(0.0)
    cand_cache = jnp.zeros((S, T_max + 1, B, C)).at[:, 0].set(cand0)
    eos_cache = jnp.zeros((S, T_max + 1, B)).at[:, 0].set(eos0)

    def state_to_cache(c):  # [L, S*B, H] -> [S, B, L, H]
        return jnp.moveaxis(c.reshape(L, S, B, H), 0, 2)

    def cache_to_state(g):  # [S, B, L, H] -> [L, S*B, H]
        return jnp.moveaxis(g, 2, 0).reshape(L, S * B, H)

    c_cache = jnp.zeros((S, T_max + 1, B, L, H)).at[:, 0].set(state_to_cache(c1))
    h_cache = jnp.zeros((S, T_max + 1, B, L, H)).at[:, 0].set(state_to_cache(h1))

    def step(carry, xs):
        score, cand_cache, eos_cache, c_cache, h_cache = carry
        pos, words_t, starts_t, mask_t, cidx_t, look_w_t, look_m_t = xs
        # words_t/starts_t/... [S, N]; look_*_t [S, C]

        # Extension scores [S, N, B]: cached logp of each node's word from
        # each path of the beam at the node's start position.  ONE fused
        # flat gather of [S, N·B] elements — composing two take_along_axis
        # calls would materialize an [S, N, B, C] (MBs) intermediate per
        # step only to keep one C-column of it.
        flat_idx = (
            starts_t[:, :, None] * (B * C)
            + jnp.arange(B, dtype=jnp.int32)[None, None, :] * C
            + cidx_t[:, :, None]
        )  # [S, N, B]
        ext_logp = jnp.take_along_axis(
            cand_cache.reshape(S, (T_max + 1) * B * C),
            flat_idx.reshape(S, N * B),
            axis=1,
        ).reshape(S, N, B)
        ext = jnp.take_along_axis(score, starts_t[:, :, None], axis=1) + ext_logp
        ext = jnp.where(mask_t[:, :, None], ext, NEG)

        # Per-sentence stable top-k over the flat (node-major, path-minor)
        # enumeration; padding slots beyond beam_width stay dead so the
        # beam is exactly the reference's width (parity rule).
        top_scores, top_idx = jax.lax.top_k(ext.reshape(S, N * B), B)
        top_scores = jnp.where(jnp.arange(B) < config.beam_width, top_scores, NEG)
        sel_n = top_idx // B
        sel_p = top_idx % B
        src_pos = jnp.take_along_axis(starts_t, sel_n, axis=1)  # [S, B]
        new_words = jnp.take_along_axis(words_t, sel_n, axis=1)  # [S, B]

        # Gather surviving LSTM states with ONE flat (pos*B + path) index.
        flat = (src_pos * B + sel_p)[:, :, None, None]  # [S, B, 1, 1]
        csel = jnp.take_along_axis(
            c_cache.reshape(S, (T_max + 1) * B, L, H), flat, axis=1
        )
        hsel = jnp.take_along_axis(
            h_cache.reshape(S, (T_max + 1) * B, L, H), flat, axis=1
        )

        # One batched LM forward over all S·B beam rows.
        cand_new, eos_new, (c_new, h_new) = forward_fn(
            params, new_words, (cache_to_state(csel), cache_to_state(hsel)),
            look_w_t,
        )
        cand_new = jnp.where(look_m_t[:, None, :], cand_new, NEG)
        alive = top_scores > NEG / 2
        cand_new = jnp.where(alive[:, :, None], cand_new, NEG)

        score = score.at[:, pos].set(top_scores)
        cand_cache = cand_cache.at[:, pos].set(cand_new)
        eos_cache = eos_cache.at[:, pos].set(eos_new)
        c_cache = c_cache.at[:, pos].set(state_to_cache(c_new))
        h_cache = h_cache.at[:, pos].set(state_to_cache(h_new))
        return (
            (score, cand_cache, eos_cache, c_cache, h_cache),
            (src_pos, sel_p, sel_n),
        )

    xs = (
        jnp.arange(1, T_max + 1),
        jnp.moveaxis(word, 1, 0),  # [T_max, S, N]
        jnp.moveaxis(start, 1, 0),
        jnp.moveaxis(mask, 1, 0),
        jnp.moveaxis(cidx, 1, 0),
        jnp.moveaxis(look_w[:, 1:], 1, 0),  # [T_max, S, C]
        jnp.moveaxis(look_m[:, 1:], 1, 0),
    )
    carry = (score, cand_cache, eos_cache, c_cache, h_cache)
    (score, cand_cache, eos_cache, _, _), bp = jax.lax.scan(step, carry, xs)
    bp_src, bp_p, bp_n = bp  # each [T_max, S, B]

    # Final <eos> rescoring at each sentence's true length (SURVEY.md §4.6).
    lcol = lengths[:, None]
    final = (
        jnp.take_along_axis(score, lcol[:, :, None], axis=1)[:, 0]
        + jnp.take_along_axis(eos_cache, lcol[:, :, None], axis=1)[:, 0]
    )  # [S, B]

    # Device-side backtracking for the top-K beams; only compact paths are
    # fetched (host link: ~200 ms latency per transfer, keep payload tiny).
    K = min(config.n_best_max, B)
    top_vals, top_beams = jax.lax.top_k(final, K)  # [S, K]
    bp_src_s = jnp.moveaxis(bp_src, 1, 0)  # [S, T_max, B]
    bp_p_s = jnp.moveaxis(bp_p, 1, 0)
    bp_n_s = jnp.moveaxis(bp_n, 1, 0)

    def wstep(carry, _):
        pos, bi = carry  # [S, K] each
        p = jnp.maximum(pos - 1, 0)  # [S, K]
        valid = pos > 0

        def gather_bp(bp):  # bp [S, T_max, B] -> [S, K]
            rows = jnp.take_along_axis(bp, p[:, :, None], axis=1)  # [S, K, B]
            return jnp.take_along_axis(rows, bi[:, :, None], axis=2)[..., 0]

        node = gather_bp(bp_n_s)
        out = jnp.where(
            valid[:, :, None],
            jnp.stack([pos, node], axis=-1),
            jnp.zeros((S, K, 2), jnp.int32),
        )
        nxt = (
            jnp.where(valid, gather_bp(bp_src_s), pos),
            jnp.where(valid, gather_bp(bp_p_s), bi),
        )
        return nxt, out

    init = (jnp.broadcast_to(lengths[:, None], (S, K)), top_beams)
    _, paths = jax.lax.scan(wstep, init, None, length=T_max)
    paths = jnp.moveaxis(paths, 0, 2)  # [S, K, T_max, 2], end-to-start

    return {
        "final_topk": top_vals,  # [S, K]
        "paths": paths.astype(jnp.int16),  # small ints: cheap to fetch
    }


class BeamDecoder:
    """Host wrapper: lattice build + pack → one device call → surfaces.

    Mirrors the reference's ``Decoder`` API (``decode(kana, top_n)``) while
    keeping every per-frame operation on device; ``decode_batch`` is the
    streaming batched entry (BASELINE config 5's per-chip unit).
    """

    def __init__(
        self,
        params,
        lexicon: Lexicon,
        vocab: Vocab,
        config: Config,
        forward_fn: Optional[ForwardFn] = None,
        precision: str = "highest",
        use_native: Optional[bool] = None,
    ):
        # Materialize params on device ONCE — passing host numpy arrays into
        # the jitted call would re-upload the full weight set (~150 MB at
        # flagship dims) on every decode_batch.
        self.params = jax.tree.map(jnp.asarray, params)
        self.lexicon = lexicon
        self.vocab = vocab
        self.config = config
        # Host-side lattice building: native C++ builder when the toolchain
        # is available (bit-identical output, ~100x less host time), else
        # the pure-Python path.
        self._native = None
        if use_native is not False:
            from jlm_tpu import native as _native_mod

            if _native_mod.available():
                self._native = _native_mod.NativeLatticeBuilder(lexicon, config)
            elif use_native is True:
                raise RuntimeError("native lattice builder requested but unavailable")
        if forward_fn is None:
            if precision == "default" and jax.default_backend() == "tpu":
                # Speed mode on TPU: Pallas head (in-kernel int8 dequant +
                # online logsumexp, bf16 MXU) — measured ~1.7-1.9x the jnp
                # head at flagship dims with identical top-1 paths.
                fwd = make_pallas_forward(config, compute_dtype=jnp.bfloat16)
            else:
                # Parity mode (or CPU): fp32 jnp head, oracle-exact.
                fwd = lambda p, w, s, cw: full_softmax_forward(
                    p, config, w, s, cw, precision=precision
                )
        else:
            fwd = forward_fn
        self._decode_jit = jax.jit(
            functools.partial(_decode_scan, config=config, forward_fn=fwd)
        )

    def results_from_packed(
        self, kana: str, packed_row: np.ndarray, finals: np.ndarray,
        paths: np.ndarray, n_best: int,
    ) -> List[DecodeResult]:
        """Materialize surfaces from device-walked paths for one sentence.

        Node identity lives in the packed tensor: word id + start position
        recover the display (``<unk>`` fallback nodes surface their kana
        substring), so no host-side lattice objects are needed.
        """
        assert n_best <= self.config.n_best_max, (
            f"n_best={n_best} exceeds config.n_best_max="
            f"{self.config.n_best_max}"
        )
        results = []
        for k in range(min(n_best, len(finals))):
            if finals[k] <= -1e29:
                continue
            segs: List[Tuple[str, int]] = []
            for pos, n in paths[k]:
                if pos <= 0:
                    break
                node = int(packed_row[int(pos) - 1, int(n)])
                word = node & ((1 << _WORD_BITS) - 1)
                start = (node >> _START_SHIFT) & 0x3F
                display = (
                    kana[start:int(pos)] if word == UNK_ID
                    else self.vocab.display(word)
                )
                segs.append((display, word))
            segs.reverse()
            results.append(
                DecodeResult(
                    surface="".join(d for d, _ in segs),
                    score=float(finals[k]),
                    segments=segs,
                )
            )
        return results

    @staticmethod
    def _bucket(n: int) -> int:
        """Pad batch sizes to power-of-two buckets.

        Each distinct batch shape costs a fresh XLA compile (~90 s through
        the tunneled remote compiler); bucketing bounds the number of
        compiled programs a serving process ever sees.
        """
        b = 1
        while b < n:
            b *= 2
        return b

    def decode_batch(
        self, kanas: List[str], n_best: int = 1
    ) -> List[List[DecodeResult]]:
        n_real = len(kanas)
        pad = self._bucket(n_real) - n_real
        kanas_padded = list(kanas) + [kanas[-1]] * pad
        if self._native is not None:
            packed, lengths = self._native.pack_batch(kanas_padded)
        else:
            lattices = [
                build_lattice(k, self.lexicon, self.vocab, self.config)
                for k in kanas_padded
            ]
            packed, lengths = pack_lattice_batch(lattices)
        # Time bucketing: scan only as many frames as the batch needs
        # (power-of-two buckets, capped at max_kana_len) — typical IME
        # inputs are ~10 kana, a 62-step scan would waste ~5x device time.
        t_bucket = min(self._bucket(int(lengths.max())), self.config.max_kana_len)
        packed = packed[:, :t_bucket]
        out = self._decode_jit(
            self.params, jnp.asarray(packed), jnp.asarray(lengths)
        )
        finals = np.asarray(out["final_topk"])
        paths = np.asarray(out["paths"])
        return [
            self.results_from_packed(
                kanas[i], packed[i], finals[i], paths[i], n_best
            )
            for i in range(n_real)
        ]

    def decode(self, kana: str, n_best: int = 1) -> List[DecodeResult]:
        return self.decode_batch([kana], n_best)[0]
