"""High-level synthesis API: text -> audio.

Mirrors the reference's canonical chain (examples/cli.rs:175-184):

    chars.transcribe(lang).intonate(lang, voice).select(voice)
         .sequence(voice).jitter(seed, voice).synthesize()

but restructured TPU-first: the variable-length text frontend runs on the
host and emits a fixed-shape parameter Score; everything after that is one
jit-compiled device program (sequencer expansion + jitter + DSP core), cached
per (num_elems, num_samples) shape bucket and batched with vmap.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .languages import get_language
from .synth.elem import SynthesisElem
from .synth.jitter import JitterLattice, apply_jitter, build_lattice
from .synth.score import Score, score_from_phoneme_elems, stack_scores
from .synth.sequencer import expand_score
from .synth.synthesize import synthesize_scan
from .text.intonate import intonate
from .text.language import Language
from .text.transcribe import transcribe
from .voices import Voice, get_voice


def _resolve_voice(voice) -> Voice:
    return get_voice(voice) if isinstance(voice, str) else voice


def _resolve_language(language) -> Language:
    return get_language(language) if isinstance(language, str) else language


def text_to_phoneme_elems(text: str, voice="generic", language="generic",
                          contour: bool = False, speaking_rate: float = 1.0):
    """Host frontend through intonation: text -> timed PhonemeElems.

    With contour=True the text is segmented into clauses at punctuation and
    each clause is intonated with the language's IntonationRules (question
    rise at '?', statement fall at '.', comma pauses) — the reference's
    roadmap lookahead intonator (README.md:15, src/lib.rs:1062-1066).

    Exposed separately from text_to_score so the fidelity harness can feed
    the EXACT element stream of the production frontend through the
    oracle's reference DSP chain (oracle_select -> oracle_synthesize)."""
    from .text.intonate import PhonemeElem as _PE, split_clauses
    from .text.phonemes import Phoneme as _P

    v = _resolve_voice(voice)
    l = _resolve_language(language)
    if not contour:
        phonemes = transcribe(text, l)
        return intonate(phonemes, l, v, contour=False,
                        speaking_rate=speaking_rate)

    pelems = []
    rate = max(speaking_rate, 1e-3)
    for clause, kind, pause in split_clauses(text):
        phonemes = transcribe(clause, l)
        pelems.extend(intonate(phonemes, l, v, contour=True,
                               speaking_rate=speaking_rate, clause=kind))
        if pause is not None:
            dur = (l.intonation.comma_pause if pause == "comma"
                   else l.intonation.sentence_pause) / rate
            pelems.append(_PE(_P.SILENCE, dur, min(0.5 * dur, 0.06 / rate),
                              v.center_frequency))
    if not pelems:   # punctuation-only / empty input: one silent element
        pelems = [_PE(_P.SILENCE, 0.12 / rate, 0.06 / rate,
                      v.center_frequency)]
    return pelems


def text_to_score(text: str, voice="generic", language="generic",
                  contour: bool = False, speaking_rate: float = 1.0,
                  pad_to: Optional[int] = None) -> Score:
    """Host frontend: transcribe + intonate + select into a device Score.
    See text_to_phoneme_elems for the contour semantics."""
    v = _resolve_voice(voice)
    pelems = text_to_phoneme_elems(text, v, language, contour=contour,
                                   speaking_rate=speaking_rate)
    return score_from_phoneme_elems(pelems, v, pad_to=pad_to)


def _score_num_samples(score: Score, sample_rate: float) -> int:
    """Total sample count from the score's host-precomputed cumulative
    end-times (Score.build) — the SAME array every device consumer reads
    (sequencer._selection_prelude, kernel_fused.build_tables), so host
    bookkeeping and device boundaries cannot disagree.
    Single-utterance scores only ([E] leading dim)."""
    C = np.asarray(score.cum_length, np.float32)
    assert C.ndim == 1, "pass per-utterance scores, not a batch"
    return int(np.floor(np.float32(C[-1]) * np.float32(sample_rate)))


# above this [Bp, T] f32 size, synthesize_scores fetches per-row device
# slices instead of one bulk copy (lane padding makes Bp a multiple of 128,
# so a 90 s batched utterance would otherwise pull ~2 GB through the tunnel)
_BULK_FETCH_BYTES = 256 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


BLOCK_SIZE = 4096

# every backend string a caller may pass; an unknown string must be a loud
# error, not a silent fall-through to the XLA path (a caller benchmarking
# "the fused kernel" would measure the ~100x-slower scan core)
_BACKENDS = ("fused", "fused_interpret", "pallas", "pallas_interpret",
             "xla", "scan")


def _check_backend(backend: str) -> str:
    if backend not in _BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; "
                         f"known: {', '.join(_BACKENDS)}")
    return backend


@functools.partial(jax.jit, static_argnames=("T", "use_scan", "kcar"))
def _synth_jit(score: Score, lattice: JitterLattice, jparams, sample_rate,
               sched, car, T: int, use_scan: bool = False,
               kcar: bool = False):
    """Fused blockwise pipeline for one utterance.

    The top-level scan iterates time blocks; each step expands the score,
    applies jitter, and synthesizes — so per-sample parameter arrays live
    only block-sized in VMEM-adjacent working sets, never [T, ...] in HBM.

    `sched` = (phi [T], cell [T]) exact jitter phase schedule for absolute
    samples 1..T (synth/schedule.py).
    `car` = exact f32 carrier phase track [T] (native pre-pass), or None
    for the Q32 accumulator (synthesize.carrier_phase).
    `kcar` = run the reference f32 carrier recurrence ON DEVICE
    (synthesize.carrier_scan, carried across blocks) — the exact carrier
    with no host pre-pass; exclusive with `car`.
    """
    from .synth.jitter import sched_slice
    from .synth.synthesize import SynthState, _block_core, carrier_scan

    jf, jdf, jdff, jda = jparams
    if use_scan:
        elems, valid = expand_score(score, sample_rate, T)
        elems = apply_jitter(elems, lattice, jdf, jdff, jda, sched)
        out, _ = synthesize_scan(elems, carrier=car)
        return out * valid

    nb = max(T // BLOCK_SIZE, 1)
    blk = T // nb

    def step(st, i):
        off = i * blk
        elems, valid = expand_score(score, sample_rate, blk, offset=off)
        elems = apply_jitter(elems, lattice, jdf, jdff, jda,
                             sched_slice(sched, off, blk))
        if kcar:
            car_b, phase_out = carrier_scan(st.phase, elems.frequency)
            out, st = _block_core(elems, st, carrier=car_b)
            st = st._replace(phase=phase_out)
        else:
            car_b = (None if car is None
                     else jax.lax.dynamic_slice(car, (off,), (blk,)))
            out, st = _block_core(elems, st, carrier=car_b)
        return st, out * valid

    _, outs = jax.lax.scan(step, SynthState.init(()), jnp.arange(nb))
    return outs.reshape(-1)


@functools.partial(jax.jit, static_argnames=("T", "backend", "kcar"))
def _synth_jit_batch(scores: Score, lattices: JitterLattice, jparams, sample_rate,
                     sched, T: int, backend: str = "xla", car=None,
                     kcar: bool = False):
    """Batched fused blockwise pipeline: scores [B, E, ...] -> audio [B, T].

    backend: 'fused' (fully-fused TPU kernel: expansion + jitter + DSP in
    one Pallas program, zero per-sample HBM input), 'fused_interpret' (same,
    interpreter mode — CPU testing), 'pallas' (round-1 streaming kernel:
    XLA-side prep + sequential-core kernel), 'pallas_interpret', 'xla'
    (associative-scan core), or 'scan' (lax.scan reference core).

    `sched` = (phi [T], cell [T]) exact jitter schedule, SHARED by every
    lane (all utterances start at jitter position 0 and the schedule is
    seed-independent).

    `kcar` (fused backends only): run the reference's exact f32 carrier
    recurrence IN-KERNEL (kernel_fused, si row 4) instead of the Q32
    fixed-point accumulator — the batched exact-carrier mode (no host
    pre-pass, no track upload). Exclusive with `car`.
    """
    from .synth.jitter import sched_slice
    from .synth.synthesize import SynthState, _block_core

    jf, jdf, jdff, jda = jparams
    B = scores.length.shape[0]

    if backend.startswith("fused"):
        from .synth.kernel_fused import build_tables, synth_fused_pallas

        tables = build_tables(scores, lattices, jparams, sample_rate)
        phi, cell = sched
        audio, _, _ = synth_fused_pallas(
            tables, T, sched=(phi[:, None], cell[:, None]),
            carrier=None if car is None else car[:, None],
            exact_carrier=kcar,
            interpret=backend == "fused_interpret")
        return audio.T                                       # [B, T]

    if backend == "scan":
        da = 0 if jnp.ndim(jdf) > 0 else None

        def expand_one(score, lattice, jdf_, jdff_, jda_):
            elems, valid = expand_score(score, sample_rate, T)
            return apply_jitter(elems, lattice, jdf_, jdff_, jda_,
                                sched), valid

        elems, valid = jax.vmap(expand_one, in_axes=(0, 0, da, da, da))(
            scores, lattices, jdf, jdff, jda)
        elems_tm = SynthesisElem(*(jnp.moveaxis(f, 0, 1) for f in elems))
        out, _ = synthesize_scan(
            elems_tm, carrier=None if car is None else car[:, None])
        return jnp.moveaxis(out, 0, 1) * valid

    use_pallas = backend.startswith("pallas")
    nb = max(T // BLOCK_SIZE, 1)
    blk = T // nb

    # jitter deltas may be per-utterance [B] (multi-voice batches) or scalar
    per_b = jnp.ndim(jdf) > 0
    d_axes = 0 if per_b else None

    def step(st, i):
        off = i * blk
        sched_b = sched_slice(sched, off, blk)

        def expand_one(score, lattice, jdf_, jdff_, jda_):
            elems, valid = expand_score(score, sample_rate, blk, offset=off)
            return apply_jitter(elems, lattice, jdf_, jdff_, jda_,
                                sched_b), valid

        elems, valid = jax.vmap(expand_one, in_axes=(0, 0, d_axes, d_axes, d_axes))(
            scores, lattices, jdf, jdff, jda)               # [B, blk, ...]
        elems_tm = SynthesisElem(*(jnp.moveaxis(f, 0, 1) for f in elems))
        if use_pallas:
            from .synth.kernel import synth_core_pallas

            out, st = synth_core_pallas(elems_tm, st,
                                        interpret=backend == "pallas_interpret")
        elif kcar:
            from .synth.synthesize import carrier_scan

            car_b, phase_out = carrier_scan(st.phase, elems_tm.frequency)
            out, st = _block_core(elems_tm, st, carrier=car_b)  # [blk, B]
            st = st._replace(phase=phase_out)
        else:
            car_b = (None if car is None else
                     jax.lax.dynamic_slice(car, (off,), (blk,))[:, None])
            out, st = _block_core(elems_tm, st, carrier=car_b)  # [blk, B]
        return st, jnp.moveaxis(out, 0, 1) * valid             # [B, blk]

    _, outs = jax.lax.scan(step, SynthState.init((B,)), jnp.arange(nb))
    # outs: [nb, B, blk] -> [B, T]
    return jnp.moveaxis(outs, 0, 1).reshape(B, nb * blk)


WARMUP = 4096  # overlap-save pre-roll (stable-IIR forget time << this)


def _choose_split(B: int, maxN: int, backend: str):
    """Overlap-save split decision: (segments per utterance S, padded T).

    The kernel runs whole 128-lane tiles, so a B-utterance batch either
    lane-pads to the next 128 multiple (S=1) or splits each utterance's
    time axis into S = 128/gcd(B,128) segments (S*B lanes, a whole number
    of tiles — see _synth_jit_split for the exact state continuation).
    Take the split iff its total lane-sample count — including the S*B
    WARMUP pre-rolls — beats unsplit lane padding. For B=1 this is what
    routes the CLI/solo path onto the production kernel at full occupancy
    (e.g. a 2 s utterance: 128 segments of 4096+4096 samples vs 128
    padded lanes re-rendering the whole 2 s each)."""
    import math

    T = _round_up(maxN, BLOCK_SIZE)
    if backend not in ("pallas", "fused"):
        return 1, T
    S = 128 // math.gcd(B, 128)
    if S == 1:
        return 1, T
    T_s = _round_up(maxN, S * BLOCK_SIZE)
    cost_split = S * B * (T_s // S + WARMUP)
    cost_unsplit = _round_up(B, 128) * T
    return (S, T_s) if cost_split < cost_unsplit else (1, T)


def _split_lane_setup(scores, lattices, jdf, jdff, jda, T: int, S: int,
                      B: int):
    """Shared overlap-save lane setup for BOTH split backends (pallas and
    fused): segment sample offsets, exact Lehmer seed continuation
    (closed-form skip-ahead; negative skip for the s=0 pre-roll so it lands
    exactly on state 0 at the first real sample), and s-major lane tiling
    of scores/lattices/per-lane jitter deltas. One implementation so the
    two paths can never desynchronize on the continuation math."""
    from .core.constants import LEHMER_A
    from .core.rng import lehmer_skip

    Ts = T // S
    W = WARMUP
    per_b = jnp.ndim(jdf) > 0
    seg_ids = jnp.arange(S)
    g0 = seg_ids * Ts - W                                    # [S]
    # per-segment Lehmer continuation seeds, computed HOST-side in
    # O(S log T) scalar skip-aheads (S, Ts, W are jit-static).
    # lehmer_affine(T) here would embed length-T uint32 constants in the
    # traced graph — 63 MB of MLIR at a 60 s utterance, which the TPU
    # compiler rejects. Segment 0's pre-roll seed is the NEGATIVE skip
    # that lands exactly on state 0 at the first real sample.
    a_inv_w = pow(LEHMER_A, -W, 1 << 32)
    s_w = lehmer_skip(W)[1]
    seed_neg = (-(a_inv_w * s_w)) & 0xFFFFFFFF
    seeds_np = np.array(
        [seed_neg] + [lehmer_skip(s * Ts - W)[1] for s in range(1, S)],
        np.uint32)
    seed0 = jnp.asarray(seeds_np)                            # [S]
    seed0 = jnp.broadcast_to(seed0[:, None], (S, B)).reshape(S * B)

    def tile(x):
        return jnp.concatenate([x] * S, axis=0)

    scores_t = jax.tree.map(tile, scores)
    lattices_t = jax.tree.map(tile, lattices)
    jp_t = tuple(tile(x) if per_b else x for x in (jdf, jdff, jda))
    g0_lane = jnp.repeat(g0, B)                              # [S*B]
    return g0, seed0, scores_t, lattices_t, jp_t, g0_lane, per_b


@functools.partial(jax.jit, static_argnames=("T", "S"))
def _synth_jit_split(scores: Score, lattices: JitterLattice, jparams, sample_rate,
                     sched, T: int, S: int):
    """Overlap-save split pipeline: B utterances x S time segments run in
    B*S kernel lanes (Pallas backend).

    The IIR stages are strict contractions (slowest formant decays in ~200
    samples), so each segment re-derives its filter state from a WARMUP-
    sample pre-roll whose output is discarded (< -80 dB residual). Carrier
    phase and RNG state are continued EXACTLY: a cheap full-T frequency
    pre-pass integrates the Q32 phase to segment boundaries, and Lehmer
    seeds come from closed-form skip-ahead (negative skip for the first
    segment's pre-roll, whose forcing is silent by construction).
    Requires T % (S * BLOCK_SIZE) == 0.

    `sched` = (phi, cell) exact jitter schedule covering absolute samples
    -WARMUP+1 .. T (index j <-> absolute sample j - WARMUP + 1), so both
    the pre-pass (samples 1..T at index off+W) and every segment pre-roll
    (index off + g0 + W >= 0) slice from one array.
    """
    from .synth.jitter import jitter_values, sched_slice
    from .synth.kernel import synth_core_pallas
    from .synth.sequencer import expand_frequency
    from .synth.synthesize import SynthState

    jf, jdf, jdff, jda = jparams
    B = scores.length.shape[0]
    Ts = T // S
    W = WARMUP
    Text = Ts + W
    blk = BLOCK_SIZE
    nb_pre = T // blk
    (g0, seed0, scores_t, lattices_t, (jdf_t, jdff_t, jda_t), g0_lane,
     per_b) = _split_lane_setup(scores, lattices, jdf, jdff, jda, T, S, B)
    d_axes = 0 if per_b else None

    # ---- pre-pass: Q32 phase at block boundaries (exact integral of the
    # same frequency stream the segments will synthesize)
    scale = jnp.float32(4294967296.0)

    def pre_step(qsum, i):
        off = i * blk
        sched_b = sched_slice(sched, off + W, blk)

        def one(score, lattice, jdf_):
            f, valid = expand_frequency(score, sample_rate, blk, offset=off)
            pitch, _, _ = jitter_values(lattice, *sched_b)
            f = f + pitch * valid.astype(jnp.float32) * jdf_
            fq = (f * scale).astype(jnp.uint32)
            return jnp.sum(fq, dtype=jnp.uint32)

        block_sums = jax.vmap(one, in_axes=(0, 0, d_axes))(scores, lattices, jdf)
        return qsum + block_sums, qsum  # emit PRE-block cumulative

    qsum0 = jnp.zeros((B,), jnp.uint32)
    _, q_at_block = jax.lax.scan(pre_step, qsum0, jnp.arange(nb_pre))
    # q_at_block[i] = phase accum before block i; boundaries g0_s = s*Ts - W
    # are block-aligned (Ts and W are BLOCK_SIZE multiples)
    inv = jnp.float32(1.0 / 4294967296.0)

    phase_seg = q_at_block[jnp.maximum(g0, 0) // blk].astype(jnp.float32) * inv
    phase0 = jnp.where((jnp.arange(S) == 0)[:, None], 0.0,
                       phase_seg).reshape(S * B)

    state0 = SynthState(
        phase=phase0,
        filter_state_a=jnp.zeros((S * B, 8), jnp.float32),
        filter_state_b=jnp.zeros((S * B, 8), jnp.float32),
        filter_state_c=jnp.zeros((S * B, 8), jnp.float32),
        seed=seed0,
    )

    nb = Text // blk
    dd = 0 if per_b else None

    def step(st, i):
        off = i * blk

        def expand_one(score, lattice, jdf_, jdff_, jda_, g0_):
            elems, valid = expand_score(score, sample_rate, blk, offset=off + g0_)
            return apply_jitter(elems, lattice, jdf_, jdff_, jda_,
                                sched_slice(sched, off + g0_ + W, blk),
                                mask=valid), valid

        elems, valid = jax.vmap(expand_one, in_axes=(0, 0, dd, dd, dd, 0))(
            scores_t, lattices_t, jdf_t, jdff_t, jda_t, g0_lane)
        elems_tm = SynthesisElem(*(jnp.moveaxis(f, 0, 1) for f in elems))
        out, st = synth_core_pallas(elems_tm, st)
        return st, jnp.moveaxis(out, 0, 1) * valid           # [S*B, blk]

    _, outs = jax.lax.scan(step, state0, jnp.arange(nb))
    full = jnp.moveaxis(outs, 0, 1).reshape(S * B, Text)      # [S*B, Text]
    segs = full[:, W:].reshape(S, B, Ts)
    return jnp.moveaxis(segs, 0, 1).reshape(B, T)


@functools.partial(jax.jit,
                   static_argnames=("lat_shift", "T", "S", "interpret"))
def _synth_jit_split_fused(scores: Score, lattices: JitterLattice, jparams,
                           sample_rate, sched_pre, sched_seg, lat_shift,
                           T: int, S: int,
                           interpret: bool = False, car_seg=None):
    """Overlap-save split on the fully-fused kernel: B utterances x S time
    segments run in B*S kernel lanes, one pallas_call for everything.

    Same continuation scheme as _synth_jit_split (WARMUP pre-roll re-derives
    filter state; carrier phase and RNG continue EXACTLY), but the phase
    pre-pass integrates in Q32 — bit-identical to the fused kernel's own
    int32 fixed-point accumulator, so segment seams are exact. The
    frequency stream here MUST stay arithmetic-identical to the kernel's
    in-VMEM expansion (expand_frequency + masked pitch jitter replicate
    kernel phases A-C for the scalar frequency field).

    Exact jitter schedule inputs (host-built by _split_sched):
    `sched_pre`  — (phi [T, 1], cell [T, 1]) for the pre-pass (samples 1..T)
    `sched_seg`  — (phi [Text, S], cell [Text, S]): per-SEGMENT windows
                   (segment s covers absolute samples s*Ts - W + 1 ..);
                   lanes are s-major so each column repeats B times.
    `lat_shift`  — [S] tuple of ints (STATIC): exact cell at each
                   segment's jitter start.
    """
    from .synth.kernel_fused import (build_tables, phase_q32_pre_block,
                                     synth_fused_pallas)
    from .synth.synthesize import SynthState

    jf, jdf, jdff, jda = jparams
    B = scores.length.shape[0]
    Ts = T // S
    W = WARMUP
    Text = Ts + W
    blk = BLOCK_SIZE
    (g0, seed0, scores_t, lattices_t, (jdf_t, jdff_t, jda_t), g0_lane,
     per_b) = _split_lane_setup(scores, lattices, jdf, jdff, jda, T, S, B)

    if car_seg is None:
        # ---- pre-pass: Q32 phase at block boundaries (exact integral of
        # the same frequency stream the fused kernel will synthesize)
        q_at_block = phase_q32_pre_block(scores, lattices, jf, jdf,
                                         sample_rate, T, blk, sched=sched_pre,
                                         interpret=interpret)   # [nb, B]

        q_seg = q_at_block[jnp.maximum(g0, 0) // blk]         # [S, B] uint32
        q_seg = jnp.where((jnp.arange(S) == 0)[:, None], jnp.uint32(0), q_seg)
        phase_q32 = jax.lax.bitcast_convert_type(q_seg, jnp.int32)
        phase_q32 = phase_q32.reshape(S * B)
    else:
        # exact-carrier mode: segment phases come from the absolute track —
        # the Q32 continuation pre-pass has nothing to continue
        phase_q32 = jnp.zeros(S * B, jnp.int32)

    state0 = SynthState(
        phase=jnp.zeros((S * B,), jnp.float32),  # overridden by phase_q32
        filter_state_a=jnp.zeros((S * B, 8), jnp.float32),
        filter_state_b=jnp.zeros((S * B, 8), jnp.float32),
        filter_state_c=jnp.zeros((S * B, 8), jnp.float32),
        seed=seed0,
    )
    tables = build_tables(scores_t, lattices_t, (jf, jdf_t, jdff_t, jda_t),
                          sample_rate, g0=g0_lane,
                          lat_shift=tuple(np.repeat(
                              np.asarray(lat_shift, np.int32), B)))
    # expand the compact per-segment schedule columns to s-major lanes
    # (cheap HBM broadcast; the compact form keeps host build + upload at
    # O(T), not O(T*B))
    phi_seg = jnp.repeat(jnp.asarray(sched_seg[0], jnp.float32), B, axis=1)
    cell_seg = jnp.repeat(jnp.asarray(sched_seg[1], jnp.int32), B, axis=1)
    car_lanes = (None if car_seg is None
                 else jnp.repeat(jnp.asarray(car_seg, jnp.float32), B, axis=1))
    full, _, _ = synth_fused_pallas(tables, Text, state=state0,
                                    phase_q32=phase_q32,
                                    sched=(phi_seg, cell_seg),
                                    carrier=car_lanes,
                                    interpret=interpret)     # [Text, S*B]
    segs = full[W:].T.reshape(S, B, Ts)
    return jnp.moveaxis(segs, 0, 1).reshape(B, T)


def _pad_track(track, T: int):
    """Edge-pad a carrier track to T samples (None passes through). The
    tail samples are invalid (valid mask zeroes their output), so their
    phase value only needs to be finite."""
    if track is None:
        return None
    t = np.asarray(track, np.float32)
    assert len(t) <= T, (len(t), T)
    if len(t) < T:
        t = np.concatenate([t, np.full(T - len(t), t[-1] if len(t) else 0.0,
                                       np.float32)])
    return jnp.asarray(t)


def _spec_for_voice(v):
    """Best-effort VoiceSpec lookup for a compiled Voice (registry by name,
    rate-retargeted like fidelity's golds). None when the voice isn't a
    registered preset — exact-carrier then silently stays off."""
    import dataclasses

    try:
        from .voices import get_spec
        spec = get_spec(v.name)
    except Exception:
        return None
    if float(spec.sample_rate) != float(v.sample_rate):
        spec = dataclasses.replace(spec, sample_rate=float(v.sample_rate))
    return spec


# Auto exact-carrier duration gate: the Q32 carrier's residual vs the
# reference's f32 recurrence is duration-growing (measured carrier-alone,
# exact jitter, benchmarks/attribution.py lab: -72.0 dB @ 10.5 s, -68.4 @
# 27.5 s, -61.7 @ 54.5 s, -57.8 @ 81.5 s). Below 30 s it keeps > 8 dB of
# margin against the -60 dB fidelity gate, and the exact track costs an
# O(T) host pre-pass plus a 4 B/sample device upload — so auto mode only
# engages past this.
EXACT_CARRIER_AUTO_SECONDS = 30.0


def _wants_exact_carrier(pelems) -> bool:
    return (sum(float(p.length) for p in pelems)
            > EXACT_CARRIER_AUTO_SECONDS)


_carrier_cache = {}


def _carrier_track_for(pelems, v, seed: int) -> Optional[np.ndarray]:
    """Host pre-pass: the reference's exact f32 carrier phase per sample
    for this utterance (native frequency chain, ~15k x realtime), memoized.
    None when the native library or the voice's spec is unavailable —
    callers then stay on the Q32 carrier (sub-gate exact, -60.7 dB at
    86.5 s; docs/PARITY.md)."""
    from .oracle.native import native_carrier_phase_track

    spec = _spec_for_voice(v)
    if spec is None:
        return None
    import hashlib

    key_parts = [f"{p.phoneme.value}:{p.length!r}:{p.blend_length!r}:"
                 f"{p.frequency!r}" for p in pelems]
    key_parts.append(f"{spec.name}:{spec.sample_rate}:{int(seed)}")
    key = hashlib.sha256("|".join(key_parts).encode()).hexdigest()
    hit = _carrier_cache.get(key)
    if hit is not None:
        return hit
    track = native_carrier_phase_track(pelems, spec, jitter_seed=int(seed))
    if track is None:
        return None
    if len(_carrier_cache) >= 32:
        _carrier_cache.clear()
    _carrier_cache[key] = track
    return track


def _split_carrier(track: np.ndarray, T: int, S: int):
    """Per-SEGMENT exact-carrier windows [Text, S] for the overlap-save
    split (segment s covers absolute samples s*Ts - W + 1 .. s*Ts + Ts).

    Segment 0's pre-roll sits BEFORE the stream: the Q32 path synthesizes
    it as virtual silence from phase 0, whose phases cycle exactly through
    {0, .25, .5, .75} (f = 0.25 exactly; 4096 steps advance phase by
    1024.0 == 0 mod 1) — reproduce that cycle so the pre-roll's lowpass
    warmup stays bit-identical to the Q32 path's, and the first real
    sample lands on track[0] (reference initial phase 0)."""
    W = WARMUP
    Ts = T // S
    Text = Ts + W
    t = np.asarray(track, np.float32)
    if len(t) < T:
        t = np.concatenate([t, np.full(T - len(t), t[-1] if len(t) else 0.0,
                                       np.float32)])
    # virtual pre-roll for segment 0: lane position p in 1..W maps to
    # absolute sample p - W <= 0; phase(p) = ((p-1) mod 4) * 0.25 makes the
    # last pre-roll update land phase 0 at absolute sample 1 (W % 4 == 0)
    pre0 = (np.arange(W, dtype=np.int64) % 4).astype(np.float32) * 0.25
    full = np.concatenate([pre0, t])            # index j <-> sample j-W+1
    seg = np.stack([full[k * Ts: k * Ts + Text] for k in range(S)], axis=1)
    return jnp.asarray(seg)


_split_sched_cache = {}


def _split_sched(inc, T: int, S: int):
    """Host-built exact-schedule inputs for the split paths, memoized per
    (rate, T, S): (sched_pre [T,1]x2, sched_seg [Text,S]x2, lat_shift [S]).

    One flat native simulation covers samples -WARMUP+1 .. T; segment
    windows are views stacked into the kernel's compact s-major layout
    (columns repeat per-B inside the jit — see _synth_jit_split_fused)."""
    import jax.numpy as jnp

    from .synth.schedule import get_schedule

    key = (float(np.float32(inc)), int(T), int(S))
    hit = _split_sched_cache.get(key)
    if hit is not None:
        return hit
    from .synth.kernel_fused import CHUNK_F, _n_lat_rows

    W = WARMUP
    Ts = T // S
    Text = Ts + W
    s = get_schedule(inc)
    phi_f, cell_f = s.window(-W, T + W)      # index j <-> sample j - W + 1
    pre = (jnp.asarray(phi_f[W:, None]), jnp.asarray(cell_f[W:, None]))
    seg = (jnp.asarray(np.stack([phi_f[k * Ts: k * Ts + Text]
                                 for k in range(S)], axis=1)),
           jnp.asarray(np.stack([cell_f[k * Ts: k * Ts + Text]
                                 for k in range(S)], axis=1)))
    # Per-segment lattice pre-shift. The kernel's per-chunk lattice window
    # base is GRID-derived — floor(f32(t01)*inc) - 2 over the LANE-local
    # position t01 — while the exact cell track follows ABSOLUTE sample
    # position. Segment 0's masked pre-roll freezes cells at 0 for W
    # samples, so in its real region the two track apart by a constant
    # ~W*inc rows: within the window cushion at 44.1 kHz (1.49 rows) but
    # past it at 22.05 kHz (2.97 rows), which silently zeroed segment-0
    # jitter (rate22050 fused regression, FIDELITY_r04). Row-selection
    # algebra is shift-invariant (shifted[irel+base+r] == orig[cell+r] for
    # ANY shift while irel stays in-window), so solve the shift
    # EMPIRICALLY: min over real-region chunk starts of (cell - grid_base)
    # pins min(irel) = 0, and the spread is asserted against the kernel's
    # window size — loud failure instead of silent jitter dropout.
    nlat = _n_lat_rows(CHUNK_F)
    incf = np.float32(inc)
    ntt = Text // CHUNK_F
    t01 = (np.arange(ntt, dtype=np.int64) * CHUNK_F + 1).astype(np.float32)
    gbase = np.maximum(np.floor(t01 * incf).astype(np.int64) - 2, 0)
    shift_np = np.empty(S, np.int32)
    for k in range(S):
        col = cell_f[k * Ts: k * Ts + Text: CHUNK_F].astype(np.int64)[:ntt]
        first = (W // CHUNK_F) if k == 0 else 0   # skip frozen pre-roll
        d = np.maximum(col, 0)[first:] - gbase[first:]
        lo, hi = int(d.min()), int(d.max())
        if hi - lo > nlat - 3:
            raise AssertionError(
                f"split lattice window overflow: segment {k} irel spread "
                f"{hi - lo} exceeds {nlat - 3} (inc={float(inc)}, T={T}, "
                f"S={S})")
        shift_np[k] = lo
    # a TUPLE marks the shifts trace-time-static: _synth_jit_split_fused
    # declares them static_argnames and build_tables lowers the lattice
    # row shift to S static slices instead of a per-lane gather
    shift = tuple(int(v) for v in shift_np)
    out = (pre, seg, shift)
    if len(_split_sched_cache) >= 16:
        _split_sched_cache.clear()
    _split_sched_cache[key] = out
    return out


def synthesize_score(score: Score, voice, seed: int = 0,
                     sample_rate: Optional[float] = None,
                     use_scan: bool = False,
                     pad_samples_to: Optional[int] = None,
                     backend: Optional[str] = None,
                     carrier_track: Optional[np.ndarray] = None,
                     exact_carrier=None) -> np.ndarray:
    """Synthesize one prepared Score to a float32 waveform.

    backend None = auto: on TPU this routes through the production path —
    the lane-splitting fused kernel program (synthesize_scores with B=1),
    the same backend as the batch headline — instead of the ~100x-slower
    XLA block scan the solo path used before (VERDICT r2 weak #2).
    'xla'/'scan' (and any CPU platform) keep the associative-scan /
    lax.scan cores.

    `pad_samples_to` pins the jit shape (e.g. to share one compile across
    many scores); it must cover the utterance and is rounded up to a block
    multiple (_synth_jit truncates non-multiples, silently losing samples).
    Pinning implies the XLA path (the fused split path buckets shapes on
    its own).

    `carrier_track` (optional f32 [>=N]): the reference's exact per-sample
    carrier phase (oracle.native.native_carrier_phase_track) — replaces
    the Q32 accumulator on the xla/scan/fused paths. Text-level callers
    (synthesize/synthesize_batch) compute it automatically for solo
    utterances when the native library is built.
    """
    v = _resolve_voice(voice)
    sr = float(sample_rate or v.sample_rate)
    explicit = backend is not None
    backend = _check_backend(backend if backend is not None
                             else ("scan" if use_scan else default_backend()))
    if backend not in ("xla", "scan"):
        if pad_samples_to is None and sr == float(v.sample_rate):
            return synthesize_scores([score], v, seeds=[seed],
                                     backend=backend,
                                     carrier_tracks=[carrier_track],
                                     exact_carrier=exact_carrier)[0]
        if explicit:
            # an explicitly requested kernel backend must not silently run
            # the XLA path — the caller would believe they measured/ran the
            # fused kernel
            raise ValueError(
                f"backend={backend!r} supports neither pad_samples_to nor a "
                "sample_rate differing from the voice's "
                f"({sr} vs {float(v.sample_rate)}); resample the voice first "
                "(voice.resampled(sr), as synthesize() does) or use "
                "backend='xla'/'scan'")
    N = _score_num_samples(score, sr)
    # device-exact carrier on the xla route (scan runs it natively): pinned
    # by 'kernel'/True, auto-engaged for long utterances without a track
    scanning = use_scan or backend == "scan"
    kcar = (carrier_track is None and not scanning
            and (exact_carrier in (True, "kernel")
                 or (exact_carrier is None
                     and N > EXACT_CARRIER_AUTO_SECONDS * sr)))
    if pad_samples_to is not None and pad_samples_to < N:
        raise ValueError(
            f"pad_samples_to={pad_samples_to} < utterance length {N}")
    T = _round_up(max(pad_samples_to or N, 1), BLOCK_SIZE)
    lattice = build_lattice(seed, T, v.jitter_frequency)
    jparams = (jnp.float32(v.jitter_frequency), jnp.float32(v.jitter_delta_frequency),
               jnp.float32(v.jitter_delta_formant_frequency), jnp.float32(v.jitter_delta_amplitude))
    from .synth.schedule import device_window

    sched = device_window(v.jitter_frequency, 0, T)
    car = _pad_track(carrier_track, T)
    out = _synth_jit(score, lattice, jparams, jnp.float32(sr), sched, car,
                     T, scanning, kcar)
    return np.asarray(out[:N], np.float32)


def synthesize(text: str, voice="generic", language="generic", seed: int = 0,
               contour: bool = False, speaking_rate: float = 1.0,
               sample_rate: Optional[float] = None,
               use_scan: bool = False,
               backend: Optional[str] = None,
               exact_carrier=None) -> np.ndarray:
    """Text -> float32 waveform (the reference CLI chain, single utterance).

    A non-default sample_rate retargets the voice first (the reference's
    resampling capability, src/lib.rs:20-21 + SynthesisElem::resample).
    `backend` pins a specific compute path (see synthesize_score); None =
    the production default for the platform.

    `exact_carrier`: None (auto — on for utterances longer than
    EXACT_CARRIER_AUTO_SECONDS when the native pre-pass is built and the
    voice is a registered preset) / True (require at any length; error if
    the pre-pass is unavailable) / False (Q32 fixed-point carrier). The
    exact carrier reproduces the reference's f32 phase recurrence
    bit-for-bit, removing its drift term vs the Q32 accumulator's exact
    mod-1 sum. That drift grows with duration (measured carrier-alone
    residual: -72.0 dB at 10.5 s, -68.4 at 27.5 s, -61.7 at 54.5 s, -57.8
    at 81.5 s, saturating ~-57 past 100 s; docs/PARITY.md), so auto mode
    only pays the O(T) pre-pass + track upload where the Q32 margin
    against the -60 dB gate actually thins."""
    v = _resolve_voice(voice)
    if sample_rate and float(sample_rate) != float(v.sample_rate):
        v = v.resampled(float(sample_rate))
    pelems = text_to_phoneme_elems(text, v, language, contour=contour,
                                   speaking_rate=speaking_rate)
    score = score_from_phoneme_elems(pelems, v)
    track = None
    if exact_carrier != "kernel" and (
            exact_carrier or (exact_carrier is None
                              and _wants_exact_carrier(pelems))):
        track = _carrier_track_for(pelems, v, seed)
    return synthesize_score(score, v, seed=seed, use_scan=use_scan,
                            backend=backend, carrier_track=track,
                            exact_carrier=exact_carrier)


def default_backend() -> str:
    """'fused' (fully-fused Pallas kernel) on real TPU hardware, 'xla'
    elsewhere."""
    import jax

    try:
        # only actual TPU backends can run the Mosaic kernels; any other
        # accelerator plugin (gpu, metal, ...) takes the XLA path. The axon
        # remote-TPU plugin reports its own platform name, hence the
        # substring check.
        plat = jax.default_backend().lower()
        return "fused" if ("tpu" in plat or plat == "axon") else "xla"
    except Exception:
        return "xla"


def synthesize_batch(texts: Sequence[str], voice="generic", language="generic",
                     seeds: Optional[Sequence[int]] = None,
                     contour: bool = False, speaking_rate: float = 1.0,
                     sample_rate: Optional[float] = None,
                     use_scan: bool = False,
                     backend: Optional[str] = None,
                     exact_carrier=None) -> List[np.ndarray]:
    """Batched synthesis: one device program over [B] utterances.

    `voice` may be a single voice/name or a per-utterance sequence
    (multi-voice batch): each utterance's score carries its own voice's
    formant tables, so mixed voices run in the same device program. All
    voices must share sample rate and jitter rate (per-voice jitter deltas
    are vectorized). `language` likewise accepts one per utterance —
    transcription/intonation are per-text host frontends, so mixed
    languages batch freely. All utterances pad to shared (E, T); outputs
    are sliced back to their true lengths. backend: 'fused' | 'pallas' |
    'xla' | 'scan' | 'fused_interpret' | 'pallas_interpret' (None = auto:
    the fully-fused kernel on TPU, xla otherwise).

    `exact_carrier`: None (auto — the reference-exact f32 carrier engages
    for utterances longer than EXACT_CARRIER_AUTO_SECONDS: the native host
    track for B == 1, the in-kernel recurrence for batches) / True
    (require exact at any length) / 'kernel' (pin the in-kernel
    recurrence) / False (Q32 fixed-point accumulator — exact mod-1 but
    drifts vs the reference's f32 recurrence past ~55 s; throughput
    opt-out). See synthesize_scores for the full decision table.
    """
    if isinstance(texts, str):
        raise TypeError(
            "texts must be a sequence of strings, not a single string — "
            "synthesize_batch('hello') would synthesize one utterance per "
            "CHARACTER; use synthesize(text) or pass [text]")
    B = len(texts)
    if B == 0:
        return []
    if isinstance(language, (list, tuple)):
        assert len(language) == B, "one language per text"
        languages_ = list(language)
    else:
        languages_ = [language] * B
    if isinstance(voice, (list, tuple)):
        voices = [_resolve_voice(v) for v in voice]
        assert len(voices) == B, "one voice per text"
    else:
        voices = [_resolve_voice(voice)] * B
    v0 = voices[0]
    assert all(float(v.sample_rate) == float(v0.sample_rate) for v in voices), \
        "batched voices must share a sample rate"
    assert all(abs(v.jitter_frequency - v0.jitter_frequency) < 1e-9 for v in voices), \
        "batched voices must share a jitter rate"
    if sample_rate and float(sample_rate) != float(v0.sample_rate):
        # retarget voices like synthesize() does (reference resample
        # semantics). Resample each DISTINCT object once — per-element
        # resampling would turn a single-voice batch into B distinct
        # objects and push it onto the per-lane jparams path for nothing.
        resampled = {}
        for v in voices:
            if id(v) not in resampled:
                resampled[id(v)] = v.resampled(float(sample_rate))
        voices = [resampled[id(v)] for v in voices]
        v0 = voices[0]
    seeds = list(seeds) if seeds is not None else [0] * B
    assert len(seeds) == B, "one seed per text"
    if backend is None:
        backend = "scan" if use_scan else default_backend()

    pelems_all = [text_to_phoneme_elems(t, v, lng, contour=contour,
                                        speaking_rate=speaking_rate)
                  for t, v, lng in zip(texts, voices, languages_)]
    scores_raw = [score_from_phoneme_elems(p, v)
                  for p, v in zip(pelems_all, voices)]
    tracks = None
    # host-track exact carrier: solo route only (split-capable overlap-save
    # at full lane occupancy, zero kernel cost). B > 1, 'kernel', and
    # track-unavailable cases resolve to the in-kernel f32 recurrence in
    # synthesize_scores.
    if B == 1 and exact_carrier != "kernel" and (
            exact_carrier or (exact_carrier is None
                              and _wants_exact_carrier(pelems_all[0]))):
        tracks = [_carrier_track_for(pelems_all[0], voices[0], seeds[0])]
        if tracks[0] is None:
            tracks = None
    return synthesize_scores(scores_raw, voices, seeds=seeds, backend=backend,
                             carrier_tracks=tracks,
                             exact_carrier=exact_carrier)


def synthesize_scores(scores: Sequence[Score], voice="generic",
                      seeds: Optional[Sequence[int]] = None,
                      backend: Optional[str] = None,
                      carrier_tracks: Optional[Sequence] = None,
                      exact_carrier=None) -> List[np.ndarray]:
    """Synthesize prepared per-utterance Scores in one batched device
    program (the score-level core under synthesize_batch; also the B=1
    production path for synthesize/synthesize_score on TPU).

    `voice` is a single voice/name or one per score (shared sample rate and
    jitter rate). Scores pad to a shared (E, T); outputs slice back to true
    lengths.

    `carrier_tracks` (optional, one per score, entries may be None): exact
    f32 carrier phase tracks (oracle.native). Consumed on the fused, xla,
    and scan paths for B == 1 (the solo/CLI route — per-lane tracks for
    B > 1 would cost O(T*B) host pre-pass + upload on the throughput path).

    `exact_carrier` selects the carrier implementation on the FUSED paths
    when no host track applies (docs/PARITY.md):
      * 'kernel' — the in-kernel f32 reference recurrence (kernel_fused
        exact_carrier): bit-identical to the reference at any batch size
        with no host pre-pass. Forces the unsplit kernel (the overlap-save
        split cannot seed segment-boundary f32 phases).
      * True     — exact required: the host track when provided, else the
        in-kernel recurrence (error on non-fused backends with B > 1).
      * None     — auto: in-kernel exact carrier for utterances longer than
        EXACT_CARRIER_AUTO_SECONDS (where the Q32 accumulator's measured
        drift vs the reference thins below the -60 dB gate margin,
        docs/PARITY.md), Q32 below it.
      * False    — the Q32 fixed-point accumulator (throughput opt-out;
        exact mod-1 but drifts vs the reference's f32 recurrence past
        ~55 s of audio)."""
    scores_raw = list(scores)
    B = len(scores_raw)
    if B == 0:
        return []
    if isinstance(voice, (list, tuple)):
        voices = [_resolve_voice(v) for v in voice]
        assert len(voices) == B, "one voice per score"
    else:
        voices = [_resolve_voice(voice)] * B
    v0 = voices[0]
    sr = float(v0.sample_rate)
    assert all(float(v.sample_rate) == sr for v in voices), \
        "batched voices must share a sample rate"
    assert all(abs(v.jitter_frequency - v0.jitter_frequency) < 1e-9
               for v in voices), "batched voices must share a jitter rate"
    seeds = list(seeds) if seeds is not None else [0] * B
    assert len(seeds) == B, "one seed per score"
    backend = _check_backend(backend if backend is not None
                             else default_backend())

    from .synth.score import pad_score

    E = max(s.num_elems for s in scores_raw)
    scores = [pad_score(s, E) for s in scores_raw]
    Ns = [_score_num_samples(s, sr) for s in scores]

    # the fused kernel's two-row-per-chunk selection needs every element to
    # span >= CHUNK_F samples; pathological scores fall back to the XLA
    # block core
    if backend.startswith("fused"):
        from types import SimpleNamespace

        from .synth.kernel_fused import fused_supported

        # fused_supported reads only .cum_length — avoid a second full
        # stack_scores of all 8 fields on the hot batch path
        lengths_only = SimpleNamespace(
            cum_length=np.stack([np.asarray(s.cum_length) for s in scores]))
        if not fused_supported(lengths_only, sr,
                               jitter_inc=float(v0.jitter_frequency)):
            # identical semantics, XLA-side expansion, and (unlike the
            # demoted round-1 pallas backend) full exact-carrier support.
            # Text frontends never produce sub-chunk elements, so this is
            # a non-path in practice (mirrors stream.py's pool fallback)
            backend = "xla"

    # ---- carrier resolution (see docstring). Host tracks take precedence
    # (B == 1 solo route, split-capable); otherwise the in-kernel f32
    # recurrence covers the fused paths at any B.
    track = None
    if (carrier_tracks is not None and B == 1
            and backend in ("fused", "fused_interpret", "xla", "scan")
            and carrier_tracks[0] is not None):
        track = np.asarray(carrier_tracks[0], np.float32)
    kcar = False
    dev_exact = backend.startswith("fused") or backend == "xla"
    if track is None and exact_carrier in (True, "kernel"):
        if backend == "scan":
            pass                 # lax.scan runs the f32 recurrence natively
        elif not dev_exact:
            raise ValueError(
                f"exact_carrier={exact_carrier!r} needs the device f32 "
                "recurrence (fused/xla backends) or a host carrier track; "
                f"backend={backend!r} supports neither")
        else:
            kcar = True
    elif (track is None and exact_carrier is None and dev_exact
          and max(Ns) > EXACT_CARRIER_AUTO_SECONDS * sr):
        # auto: long utterances engage the device-exact carrier — the Q32
        # accumulator's drift vs the reference thins below the -60 dB gate
        # margin past ~55 s (docs/PARITY.md)
        kcar = True

    if kcar:
        S, T = 1, _round_up(max(max(Ns), 1), BLOCK_SIZE)
    else:
        S, T = _choose_split(B, max(max(Ns), 1), backend)

    Bp = B
    if backend.startswith(("pallas", "fused")) and S == 1:
        from .synth.kernel import LANE

        Bp = _round_up(B, LANE)
        scores = scores + [scores[0]] * (Bp - B)   # lane padding rows
        seeds = seeds + [0] * (Bp - B)
        voices = voices + [voices[0]] * (Bp - B)

    # memoize per seed: lane padding appends up to 127 duplicate seed-0
    # rows, and build_lattice's per-row host loop would otherwise re-run
    # for every one of them on each new shape bucket
    lat_cache = {}

    def _lat(sd):
        if sd not in lat_cache:
            lat_cache[sd] = build_lattice(sd, T, v0.jitter_frequency)
        return lat_cache[sd]

    lattices = [_lat(sd) for sd in seeds]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = stack_scores(scores)
    multi = any(v is not voices[0] for v in voices)
    if multi:
        jparams = (jnp.float32(v0.jitter_frequency),
                   jnp.asarray([v.jitter_delta_frequency for v in voices], jnp.float32),
                   jnp.asarray([v.jitter_delta_formant_frequency for v in voices], jnp.float32),
                   jnp.asarray([v.jitter_delta_amplitude for v in voices], jnp.float32))
    else:
        jparams = (jnp.float32(v0.jitter_frequency),
                   jnp.float32(v0.jitter_delta_frequency),
                   jnp.float32(v0.jitter_delta_formant_frequency),
                   jnp.float32(v0.jitter_delta_amplitude))
    from .synth.schedule import device_window

    inc = v0.jitter_frequency
    if S > 1:
        if backend == "fused":
            pre, seg, shift = _split_sched(inc, T, S)
            car_seg = None if track is None else _split_carrier(track, T, S)
            out = np.asarray(_synth_jit_split_fused(
                batched, lattices, jparams, jnp.float32(sr),
                pre, seg, shift, T, S, car_seg=car_seg))
        else:
            sched = device_window(inc, -WARMUP, T + WARMUP)
            out = np.asarray(_synth_jit_split(batched, lattices, jparams,
                                              jnp.float32(sr), sched, T, S))
    else:
        sched = device_window(inc, 0, T)
        car = None
        if track is not None:
            car = _pad_track(track, T)
        out_dev = _synth_jit_batch(batched, lattices, jparams,
                                   jnp.float32(sr), sched, T, backend,
                                   car=car, kcar=kcar)
        if Bp * T * 4 > _BULK_FETCH_BYTES:
            # big programs (long-form batches: Bp is lane-padded to 128, so
            # the [Bp, T] buffer can reach GBs) fetch per requested row,
            # sliced to true length ON DEVICE — the padding lanes and the
            # tail never cross the tunnel
            return [np.asarray(out_dev[i, :n], np.float32)
                    for i, n in enumerate(Ns)]
        out = np.asarray(out_dev)
    return [out[i, :n].astype(np.float32) for i, n in enumerate(Ns)]


__all__ = [
    "text_to_phoneme_elems", "text_to_score", "synthesize_score",
    "synthesize", "synthesize_batch", "synthesize_scores",
]
