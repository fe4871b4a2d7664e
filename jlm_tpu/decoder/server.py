"""Multi-session IME serving: batched per-keystroke steps.

Production deployment serves MANY concurrent typing sessions; the
per-keystroke engine (SURVEY.md §4.7) must batch keystrokes arriving from
different sessions into one device step or throughput dies by dispatch
latency.  ``SessionServer`` holds ``max_sessions`` session states in
device arrays with a leading session axis and advances an arbitrary batch
of ``(session, kana_char)`` events per jitted call:

- per-event frame nodes are built host-side (same canonical rules as the
  lattice builder — parity with single-session decoding is exact);
- the device step gathers each event's beam/caches by session index,
  scores extensions lazily (cached per-path logsumexp + candidate-column
  logits, as in :mod:`jlm_tpu.decoder.incremental`), prunes, runs ONE
  LM forward over all events' beams, and scatters results back;
- event batches pad to power-of-two buckets (bounded compile count).

Session lifecycle: ``open() -> sid``, ``push(events)``, ``results(sid)``,
``backspace(sid)``, ``close(sid)``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jlm_tpu.config import Config, EOS_ID
from jlm_tpu.data.corpus import Vocab
from jlm_tpu.data.lexicon import Lexicon
from jlm_tpu.decoder.lattice import Node
from jlm_tpu.decoder.incremental import _forward_with_lse
from jlm_tpu.models.lstm import node_logits as _node_logits
from jlm_tpu.oracle.decoder import DecodeResult


def _batch_keystroke_step(
    params,
    score_c,  # [Smax, T+1, B]
    lse_c,  # [Smax, T+1, B]
    eos_c,  # [Smax, T+1, B]
    c_c,  # [Smax, T+1, B, L, H]
    h_c,  # [Smax, T+1, B, L, H]
    htop_c,  # [Smax, T+1, B, H]
    sid,  # int32 [E] session index per event
    pos,  # int32 [E] new end position per event (1-based)
    node_word,  # int32 [E, N]
    node_start,  # int32 [E, N]
    node_mask,  # bool [E, N]
    ev_mask,  # bool [E] real event (not padding)
    *,
    config: Config,
    precision: str,
):
    E, N = node_word.shape
    B = config.beam_pad
    L, H = config.num_layers, config.hidden_size
    NEG = jnp.float32(-1e30)

    # Per-event caches gathered by session: [E, T+1, ...]
    def ses(x):
        return jnp.take(x, sid, axis=0)

    htop_e = ses(htop_c)  # [E, T+1, B, H]
    h_src = jnp.take_along_axis(
        htop_e, node_start[:, :, None, None], axis=1
    )  # [E, N, B, H]
    # lazy logits: one output-column gather per (event, node), O(E·N·B·H)
    logits = _node_logits(params, config, h_src, node_word, precision)

    score_e = jnp.take_along_axis(ses(score_c), node_start[:, :, None], axis=1)
    lse_e = jnp.take_along_axis(ses(lse_c), node_start[:, :, None], axis=1)
    ext = score_e + logits - lse_e
    ext = jnp.where(node_mask[:, :, None], ext, NEG)

    top_scores, top_idx = jax.lax.top_k(ext.reshape(E, N * B), B)
    top_scores = jnp.where(jnp.arange(B) < config.beam_width, top_scores, NEG)
    sel_n = top_idx // B
    sel_p = top_idx % B
    src_pos = jnp.take_along_axis(node_start, sel_n, axis=1)  # [E, B]
    new_words = jnp.take_along_axis(node_word, sel_n, axis=1)

    flat = (src_pos * B + sel_p)[:, :, None, None]
    T1 = score_c.shape[1]
    c_sel = jnp.take_along_axis(ses(c_c).reshape(E, T1 * B, L, H), flat, axis=1)
    h_sel = jnp.take_along_axis(ses(h_c).reshape(E, T1 * B, L, H), flat, axis=1)
    c_in = jnp.moveaxis(c_sel, 2, 0).reshape(L, E * B, H)
    h_in = jnp.moveaxis(h_sel, 2, 0).reshape(L, E * B, H)

    (c2, h2), h_top, lse, eos = _forward_with_lse(
        params, config, new_words.reshape(E * B), (c_in, h_in), precision
    )

    # scatter back per event at (sid, pos); padding events scatter to a
    # dummy session row (Smax-1 is reserved) so they never disturb state.
    Smax = score_c.shape[0]
    sid_w = jnp.where(ev_mask, sid, Smax - 1)
    pos_w = jnp.where(ev_mask, pos, 0)

    score_c = score_c.at[sid_w, pos_w].set(top_scores, mode="drop")
    lse_c = lse_c.at[sid_w, pos_w].set(lse.reshape(E, B), mode="drop")
    eos_c = eos_c.at[sid_w, pos_w].set(eos.reshape(E, B), mode="drop")
    c_new = jnp.moveaxis(c2.reshape(L, E, B, H), 0, 2)  # [E, B, L, H]
    h_new = jnp.moveaxis(h2.reshape(L, E, B, H), 0, 2)
    c_c = c_c.at[sid_w, pos_w].set(c_new, mode="drop")
    h_c = h_c.at[sid_w, pos_w].set(h_new, mode="drop")
    htop_c = htop_c.at[sid_w, pos_w].set(h_top.reshape(E, B, H), mode="drop")

    finals = top_scores + eos.reshape(E, B)
    packed = jnp.stack(
        [
            src_pos.astype(jnp.int32),
            sel_p.astype(jnp.int32),
            sel_n.astype(jnp.int32),
            jax.lax.bitcast_convert_type(finals, jnp.int32),
        ],
        axis=1,
    )  # [E, 4, B]
    return (score_c, lse_c, eos_c, c_c, h_c, htop_c), packed


class SessionServer:
    def __init__(
        self,
        params,
        lexicon: Lexicon,
        vocab: Vocab,
        config: Config,
        max_sessions: int = 64,
        precision: str = "highest",
    ):
        self.params = jax.tree.map(jnp.asarray, params)
        self.lexicon = lexicon
        self.vocab = vocab
        self.config = config
        # one extra reserved row absorbs padding-event scatters
        self.Smax = max_sessions + 1
        self._step = jax.jit(
            functools.partial(
                _batch_keystroke_step, config=config, precision=precision
            )
        )
        cfg = config
        B, L, H, T1 = cfg.beam_pad, cfg.num_layers, cfg.hidden_size, cfg.max_kana_len + 1
        self._score = jnp.full((self.Smax, T1, B), -1e30)
        self._lse = jnp.zeros((self.Smax, T1, B))
        self._eos = jnp.zeros((self.Smax, T1, B))
        self._c = jnp.zeros((self.Smax, T1, B, L, H))
        self._h = jnp.zeros((self.Smax, T1, B, L, H))
        self._htop = jnp.zeros((self.Smax, T1, B, H))
        self._root: Optional[Tuple] = None
        self._free = list(range(max_sessions))
        self._kana: Dict[int, str] = {}
        self._frames: Dict[int, List[List[Node]]] = {}
        self._bp: Dict[int, List] = {}
        self._finals: Dict[int, List] = {}

    # --- session lifecycle -------------------------------------------------
    def open(self) -> int:
        assert self._free, "session pool exhausted"
        sid = self._free.pop()
        if self._root is None:
            self._root = self._compute_root()
        c, h, h_top, lse, eos = self._root
        self._score = self._score.at[sid].set(-1e30).at[sid, 0, 0].set(0.0)
        self._lse = self._lse.at[sid, 0].set(lse)
        self._eos = self._eos.at[sid, 0].set(eos)
        self._c = self._c.at[sid, 0].set(c)
        self._h = self._h.at[sid, 0].set(h)
        self._htop = self._htop.at[sid, 0].set(h_top)
        self._kana[sid] = ""
        self._frames[sid] = [[]]
        self._bp[sid] = [None]
        self._finals[sid] = [None]
        return sid

    def _compute_root(self):
        from jlm_tpu.models.lstm import initial_state

        cfg = self.config
        B = cfg.beam_pad
        state = initial_state(cfg, B)
        (c, h), h_top, lse, eos = _forward_with_lse(
            self.params, cfg, jnp.full((B,), EOS_ID, jnp.int32), state,
            "highest",
        )
        # [L,B,H] -> [B,L,H]
        return jnp.moveaxis(c, 0, 1), jnp.moveaxis(h, 0, 1), h_top, lse, eos

    def close(self, sid: int) -> None:
        for d in (self._kana, self._frames, self._bp, self._finals):
            d.pop(sid, None)
        self._free.append(sid)

    def backspace(self, sid: int) -> None:
        assert self._kana[sid], "nothing to delete"
        self._kana[sid] = self._kana[sid][:-1]

    # --- batched keystrokes ------------------------------------------------
    def _frame_nodes(self, sid: int, pos: int) -> List[Node]:
        cfg = self.config
        kana = self._kana[sid]
        M = min(cfg.max_word_len, self.lexicon.max_reading_len)
        nodes: List[Node] = []
        for start in range(max(0, pos - M), pos):
            reading = kana[start:pos]
            for wid, disp in self.lexicon.candidates(reading):
                display = disp if disp is not None else self.vocab.display(wid)
                nodes.append(Node(wid, start, pos, display))
        nodes.sort(key=lambda n: n.start)
        from jlm_tpu.decoder.lattice import handle_node_overflow

        handle_node_overflow(
            len(nodes) - cfg.max_nodes_per_frame, cfg, f"sid={sid} pos={pos}"
        )
        return nodes[: cfg.max_nodes_per_frame]

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def push(self, events: Sequence[Tuple[int, str]]) -> None:
        """Advance a batch of sessions by one kana each (one device step).

        ``events`` = [(sid, kana_char)]; a session may appear at most once
        per batch.
        """
        cfg = self.config
        E_real = len(events)
        assert E_real > 0
        sids = [s for s, _ in events]
        assert len(set(sids)) == E_real, "duplicate session in one batch"
        E = self._bucket(E_real)
        N = cfg.max_nodes_per_frame

        sid_a = np.zeros(E, np.int32)
        pos_a = np.zeros(E, np.int32)
        nw = np.full((E, N), EOS_ID, np.int32)
        ns = np.zeros((E, N), np.int32)
        nm = np.zeros((E, N), bool)
        ev = np.zeros(E, bool)
        frames_new: List[List[Node]] = []
        for i, (sid, ch) in enumerate(events):
            assert len(ch) == 1, "one kana per event"
            pos = len(self._kana[sid]) + 1
            assert pos <= cfg.max_kana_len
            self._kana[sid] += ch
            nodes = self._frame_nodes(sid, pos)
            frames_new.append(nodes)
            sid_a[i], pos_a[i], ev[i] = sid, pos, True
            for k, n in enumerate(nodes):
                nw[i, k], ns[i, k], nm[i, k] = n.word_id, n.start, True

        caches = (self._score, self._lse, self._eos, self._c, self._h, self._htop)
        caches, packed = self._step(
            self.params, *caches,
            jnp.asarray(sid_a), jnp.asarray(pos_a),
            jnp.asarray(nw), jnp.asarray(ns), jnp.asarray(nm), jnp.asarray(ev),
        )
        (self._score, self._lse, self._eos, self._c, self._h, self._htop) = caches
        out = np.asarray(packed)  # [E, 4, B] — one fetch for the whole batch
        for i, (sid, _) in enumerate(events):
            pos = int(pos_a[i])
            while len(self._frames[sid]) <= pos:
                self._frames[sid].append([])
                self._bp[sid].append(None)
                self._finals[sid].append(None)
            self._frames[sid][pos] = frames_new[i]
            self._bp[sid][pos] = (out[i, 0], out[i, 1], out[i, 2])
            self._finals[sid][pos] = out[i, 3].view(np.float32)

    def results(self, sid: int, n_best: int = 1) -> List[DecodeResult]:
        T = len(self._kana[sid])
        if T == 0:
            return []
        finals = self._finals[sid][T]
        order = np.argsort(-finals, kind="stable")[:n_best]
        res = []
        for b in order:
            if finals[b] <= -1e29:
                continue
            segs: List[Tuple[str, int]] = []
            pos, bi = T, int(b)
            while pos > 0:
                src, selp, seln = self._bp[sid][pos]
                node = self._frames[sid][pos][int(seln[bi])]
                segs.append((node.display, node.word_id))
                pos, bi = int(src[bi]), int(selp[bi])
            segs.reverse()
            res.append(
                DecodeResult(
                    surface="".join(d for d, _ in segs),
                    score=float(finals[b]),
                    segments=segs,
                )
            )
        return res
