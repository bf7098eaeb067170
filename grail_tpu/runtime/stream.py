"""Streaming synthesis session — the interactive.rs capability, TPU-style.

The reference's streaming example (examples/interactive.rs) wires stdin
chars into the lazy pipeline and lets the audio callback pull samples; idle
input injects ' ' which transcribes to Silence, so the stream never starves.

Here the same contract is block-structured: `feed(text)` runs the host
frontend incrementally and appends timed elements to a rolling score;
`read(n)` synthesizes the next n samples with all DSP state (sequencer
position, jitter lattice continuation, carrier phase, filter states, RNG)
carried across calls — the streaming analogue of the reference's iterator
state (src/lib.rs:470-488). Latency is the block size (e.g. 1024 samples =
23 ms), throughput is the jit-compiled block pipeline.

The rolling score is rebased (consumed elements dropped) so jit shapes stay
in a small set of E buckets and sessions can run unboundedly.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import NUM_FORMANTS

from ..synth.jitter import JitterLattice
from ..synth.score import Score, score_from_phoneme_elems
from ..synth.sequencer import expand_score
from ..synth.synthesize import (SynthState, carrier_scan as _carrier_scan,
                                synthesize_block)
from ..text.intonate import PhonemeElem, intonate
from ..text.phonemes import Phoneme
from ..text.transcribe import transcribe_chars, transcribe_partial
from ..voices import Voice, get_voice
from ..languages import get_language


class _IncrementalLattice:
    """Value-noise lattices grown on demand (unbounded sessions), with a
    SLIDING window: cells the stream has passed are dropped (see
    StreamSession._maybe_rebase_jitter), so long-running sessions hold a
    bounded window instead of an ever-growing array.

    Holds the three Lehmer continuation states exactly as the reference's
    noise generators do (see synth/jitter.py docstring for the layout);
    after drop(K) the arrays hold cells [K, K+len) of the absolute stream
    and ensure() keeps appending the SAME draws the never-dropped stream
    would contain. `version` keys upload caches (content changes only on
    append/drop)."""

    def __init__(self, seed: int):
        from ..core.rng import NpLehmer

        rng = NpLehmer(seed)
        p0, p1 = rng.next_f32(), rng.next_f32()
        self._pitch_state = NpLehmer(rng.state)
        f = np.zeros((2, NUM_FORMANTS), np.float32)
        for j in range(NUM_FORMANTS):
            f[0, j] = rng.next_f32()
            f[1, j] = rng.next_f32()
        self._formant_state = NpLehmer(rng.state)
        a = np.zeros((2, NUM_FORMANTS), np.float32)
        for j in range(NUM_FORMANTS):
            a[0, j] = rng.next_f32()
            a[1, j] = rng.next_f32()
        self._amp_state = NpLehmer(rng.state)

        self.pitch = np.array([p0, p1], np.float32)
        self.formant = f
        self.amp = a
        self.version = 0

    def ensure(self, cells: int) -> None:
        from ..core.rng import lehmer_states, np_random_f32_from_state

        grew = False
        k = cells - len(self.pitch)
        if k > 0:
            states = lehmer_states(self._pitch_state.state, k)
            self.pitch = np.concatenate(
                [self.pitch, np_random_f32_from_state(states)])
            self._pitch_state.state = int(states[-1])
            grew = True
        for name, st in (("formant", self._formant_state),
                         ("amp", self._amp_state)):
            arr = getattr(self, name)
            k = cells - len(arr)
            if k > 0:
                states = lehmer_states(st.state, k * NUM_FORMANTS)
                rows = np_random_f32_from_state(states).reshape(
                    k, NUM_FORMANTS)
                setattr(self, name, np.vstack([arr, rows]))
                st.state = int(states[-1])
                grew = True
        if grew:
            self.version += 1

    def drop(self, k: int) -> None:
        """Slide the window: discard the first k cells (already passed)."""
        if k <= 0:
            return
        self.pitch = self.pitch[k:]
        self.formant = self.formant[k:]
        self.amp = self.amp[k:]
        self.version += 1

    def window(self) -> JitterLattice:
        """The FULL current window as a JitterLattice — test/reference use
        only. Production ticks slice `[:cells]` and pass `lat_window=` so
        the kernel gathers a handful of rows, not the whole window (the
        full-window gather is the ~29 ms/tick regression; build_tables)."""
        return JitterLattice(self.pitch, self.formant, self.amp)


STREAM_COMMANDS = ("pitch", "rate", "voice", "lang")


def _parse_commands(text: str, partial: bool = False):
    """Split text into ('text', str) and (command, value) chunks.

    Grammar (documented in docs/AUTHORING.md — the reference's planned
    parser stage, src/lib.rs:1366, README.md:19):

        command  := '[' key ':' value ']'     key in STREAM_COMMANDS
        literal  := '[['  (a literal '[')  |  ']]'  (a literal ']')

    Malformed input is a loud ValueError — an unterminated '[', a
    bracket body without ':', or an unknown key (silently speaking a
    mistyped command as text hides the mistake from the author).

    With partial=True (the incremental feed() path) returns
    (chunks, tail): a trailing fragment that could still become valid
    with more input — an unterminated '[...'  command, a lone final
    '[' (possible '[[' half), or a lone final ']' (possible ']]'
    half) — is held back as `tail` instead of raising/emitting, so
    commands may arrive split across feed() chunk boundaries."""
    out = []
    buf = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "[":
            if i + 1 == n and partial:      # could become '[[' next chunk
                return (out + ([("text", "".join(buf))] if buf else []),
                        text[i:])
            if text[i + 1:i + 2] == "[":
                buf.append("[")
                i += 2
                continue
            k = text.find("]", i)
            if k < 0:
                if partial:                 # command may terminate later
                    return (out + ([("text", "".join(buf))] if buf else []),
                            text[i:])
                raise ValueError(
                    f"unterminated command bracket at {text[i:i + 20]!r} "
                    "(use '[[' for a literal '[')")
            body = text[i + 1:k]
            if ":" not in body:
                raise ValueError(
                    f"malformed command {('[' + body + ']')!r}: expected "
                    "[key:value] (use '[[' for a literal '[')")
            key, val = body.split(":", 1)
            if key not in STREAM_COMMANDS:
                raise ValueError(
                    f"unknown stream command {key!r} "
                    f"(known: {', '.join(STREAM_COMMANDS)})")
            if buf:
                out.append(("text", "".join(buf)))
                buf = []
            out.append((key, val.strip()))
            i = k + 1
        elif c == "]" and text[i + 1:i + 2] == "]":
            buf.append("]")
            i += 2
        elif c == "]" and i + 1 == n and partial:  # possible ']]' half
            return (out + ([("text", "".join(buf))] if buf else []),
                    text[i:])
        else:
            buf.append(c)
            i += 1
    if buf:
        out.append(("text", "".join(buf)))
    return (out, "") if partial else out


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


def _scatter_bucket(n: int) -> int:
    """Next power of two with NO floor — the incremental-scatter K bucket.
    Must stay in {1, 2, 4, 8} for n <= 8: serve_start AOT-warms exactly
    those shapes, and a single-session feed (n=1, the common case) must
    hit the K=1 program, not a 16-row padded upload."""
    return 1 << max(0, n - 1).bit_length()


def _jsched_scan(jphi, jcell, inc, block: int):
    """The reference jitter phase recurrence, carried on device: `block`
    steps of `phase = f32(phase + inc); if phase > 1: phase -= 1` from the
    per-session state (jphi f32 [...], jcell i32 [...] ABSOLUTE cell =
    cumulative wrap count). IEEE f32 adds, so this is bit-identical to the
    host schedule (synth/schedule.py) and the fused kernel's in-kernel
    recurrence. Returns (phi [block, ...], cell [block, ...], final state).
    """
    inc = jnp.float32(inc)
    one = jnp.float32(1.0)

    def step(c, _):
        p, cl = c
        p = p + inc
        w = p > one
        p = jnp.where(w, p - one, p)
        cl = cl + w.astype(jnp.int32)
        return (p, cl), (p, cl)

    (pf, cf), (phis, cells) = jax.lax.scan(
        step, (jnp.asarray(jphi, jnp.float32), jnp.asarray(jcell, jnp.int32)),
        None, length=block)
    return phis, cells, (pf, cf)


@functools.partial(jax.jit, static_argnames=("block",))
def _stream_block(score: Score, lattice: JitterLattice, jparams, sample_rate,
                  offset, jstate, lat_base, state: SynthState, block: int):
    """One solo-session block. `jstate` = (jphi, jcell) carried jitter phase
    state (scalars); `lat_base` = absolute cell index of the session's
    lattice window row 0 (changes only on window slides). The carrier is
    the exact f32 reference recurrence carried in state.phase
    (_carrier_scan) — streams are long-running by nature, where the Q32
    accumulator's drift vs the reference thins below the -60 dB gate
    (docs/PARITY.md)."""
    from ..synth.jitter import apply_jitter
    from ..synth.synthesize import _block_core

    jf, jdf, jdff, jda = jparams
    phi, cell, jstate2 = _jsched_scan(jstate[0], jstate[1], jf, block)
    elems, valid = expand_score(score, sample_rate, block, offset=offset)
    elems = apply_jitter(elems, lattice, jdf, jdff, jda,
                         (phi, cell - lat_base))
    car, phase_out = _carrier_scan(state.phase, elems.frequency)
    out, state = _block_core(elems, state, carrier=car)
    state = state._replace(phase=phase_out)
    return out, state, jstate2


@functools.partial(jax.jit, static_argnames=("block", "use_pallas"))
def _stream_block_batch(scores: Score, lattices: JitterLattice, jparams,
                        sample_rate, offsets, jstate, lat_base,
                        states: SynthState, block: int, use_pallas: bool):
    """One tick for N concurrent sessions: scores [N, E], per-session sample
    offsets, stacked states -> (audio [N, block], new states, new jstate).
    `jstate` = (jphi [N], jcell [N] absolute); `lat_base` [N] i32 maps
    absolute cells onto each session's lattice window rows."""
    from ..synth.jitter import apply_jitter
    from ..synth.synthesize import _block_core

    jf, jdf, jdff, jda = jparams  # jf scalar; deltas may be per-session [N]
    phis, cells, jstate2 = _jsched_scan(jstate[0], jstate[1], jf, block)

    def one(score, lattice, off, phi, cell_rel, jdf_, jdff_, jda_):
        elems, valid = expand_score(score, sample_rate, block, offset=off)
        return apply_jitter(elems, lattice, jdf_, jdff_, jda_,
                            (phi, cell_rel), mask=valid), valid

    da = 0 if jnp.ndim(jdf) > 0 else None
    elems, valid = jax.vmap(one, in_axes=(0, 0, 0, 1, 1, da, da, da))(
        scores, lattices, offsets, phis, cells - lat_base[None, :],
        jdf, jdff, jda)
    from ..synth.elem import SynthesisElem as _SE

    elems_tm = _SE(*(jnp.moveaxis(f, 0, 1) for f in elems))
    if use_pallas:
        # historical round-1 kernel path (Q32 carrier in its prep); no
        # production route selects it — kept only for A/B measurement
        from ..synth.kernel import synth_core_pallas

        out, states = synth_core_pallas(elems_tm, states)
    else:
        # exact f32 carrier, carried per session in states.phase — matches
        # the fused tick's in-kernel recurrence bit-for-bit
        car, phase_out = _carrier_scan(states.phase, elems_tm.frequency)
        out, states = _block_core(elems_tm, states, carrier=car)
        states = states._replace(phase=phase_out)
    return jnp.moveaxis(out, 0, 1), states, jstate2


def _stream_tick_fused_body(scores: Score, lattices: JitterLattice, jparams,
                            sample_rate, offsets, jstate, lat_base,
                            states: SynthState,
                            block: int, interpret: bool = False,
                            lat_window=None):
    """One pool tick on the fully-fused kernel: per-session score offsets go
    in as per-lane g0; the jitter phase rides as CARRIED per-session state
    (jphi f32 [N], jcell i32 [N] absolute cell) which the kernel steps with
    the reference recurrence itself ('carry' mode) — the exact schedule
    with zero per-tick upload. `lat_base` [N] i32 is the absolute cell of
    each session's lattice-window row 0 (uploaded with the window; changes
    only on the rare window slides). N is lane-padded (the kernel runs
    whole 128-lane tiles); padding lanes replay session 0 and are sliced
    off.

    Returns (audio [N, block], new states, advanced offsets, new jstate) —
    offsets and jstate round-trip through the device so steady-state ticks
    (no new text, no rebase) dispatch with ZERO host->device transfers: on
    the axon platform every per-tick transfer costs a ~30 ms tunnel round
    trip.

    Un-jitted body: jit'd below as _stream_tick_fused, and wrapped
    per-shard by parallel.sharded.sharded_stream_tick_fn (multi-chip
    serving: sessions shard over the mesh 'data' axis; the per-lane math
    is lane-count independent, so shard outputs match the single-device
    pool's to ~1 ulp of FMA-contraction variance).
    """
    from ..synth.kernel_fused import LANE_F, build_tables, synth_fused_pallas

    N = scores.length.shape[0]
    lane = N if interpret else LANE_F
    Np = ((N + lane - 1) // lane) * lane
    jf, jdf, jdff, jda = jparams

    def padn(x):
        x = jnp.asarray(x)
        if Np == N:
            return x
        reps = jnp.broadcast_to(x[:1], (Np - N,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    per = jnp.ndim(jdf) > 0
    jp = (jf, padn(jdf) if per else jdf, padn(jdff) if per else jdff,
          padn(jda) if per else jda)
    jphi, jcell = (jnp.asarray(jstate[0], jnp.float32),
                   jnp.asarray(jstate[1], jnp.int32))
    lat_base = jnp.asarray(lat_base, jnp.int32)
    tables = build_tables(jax.tree.map(padn, scores),
                          jax.tree.map(padn, lattices), jp, sample_rate,
                          g0=padn(offsets),
                          lat_shift=jnp.maximum(padn(jcell - lat_base), 0),
                          lat_base=padn(lat_base),
                          window=lat_window)
    audio, new_states, jstate2 = synth_fused_pallas(
        tables, block, state=SynthState(*(padn(f) for f in states)),
        jitter_state=(padn(jphi), padn(jcell)),
        exact_carrier=True,
        interpret=interpret)
    return (audio.T[:N], SynthState(*(x[:N] for x in new_states)),
            offsets + block, (jstate2[0][:N], jstate2[1][:N]))


@functools.partial(jax.jit, static_argnames=("block", "interpret", "out_fmt",
                                             "lat_window"))
def _stream_tick_fused(scores: Score, lattices: JitterLattice, jparams,
                       sample_rate, offsets, jstate, lat_base,
                       states: SynthState,
                       block: int, interpret: bool = False,
                       out_fmt: str = "f32", lat_window=None):
    """out_fmt folds the output conversion (pcm16 / G.711 ulaw) INTO this
    jit: a pool tick is then exactly ONE device execution per tick.
    lat_window truncates the shifted jitter lattice to the rows one block
    can touch (the full-window gather is what made a tick cost ~29 ms on
    TPU — see build_tables)."""
    out, states, off2, jstate2 = _stream_tick_fused_body(
        scores, lattices, jparams, sample_rate, offsets, jstate, lat_base,
        states, block, interpret, lat_window=lat_window)
    if out_fmt == "pcm16":
        out = _pcm16_body(out)
    elif out_fmt == "ulaw":
        out = _ulaw_body(out)
    return out, states, off2, jstate2


def _pcm16_body(audio):
    x = audio * jnp.float32(32767.0)
    x = jnp.clip(x, -32768.0, 32767.0)
    x = jnp.where(jnp.isnan(x), 0.0, x)
    return x.astype(jnp.int16)


def _ulaw_body(audio):
    """f32 [-1,1] -> G.711 mu-law (uint8), the telephony serving format.

    Serving pools can emit this directly (StreamPool output='ulaw'): it is
    what network TTS streaming actually ships (G.711 PSTN/SIP), and it
    QUARTERS the device->host audio bandwidth vs f32 — at N=128,
    block=1024 that is 2.8 MB/s instead of 11.3 (pcm16) / 22.5 (f32),
    which decides how fast a serving link recovers from a transport stall
    (docs/SERVING.md). Standard encoder: BIAS=0x84, clip 32635, 8
    exponent segments, inverted output bits."""
    pcm = _pcm16_body(audio).astype(jnp.int32)
    sign = jnp.where(pcm < 0, jnp.int32(0x80), jnp.int32(0))
    m = jnp.minimum(jnp.abs(pcm), 32635) + jnp.int32(0x84)
    # exponent = position of the MSB of m relative to bit 7, in INTEGER
    # arithmetic: a comparison ladder (m >= 2^(k+8) for k in 0..6) —
    # hardware log2/exp are polynomial approximations on TPU (not
    # correctly rounded), so a float path could floor 7.9999995 to 7 and
    # shift a whole segment at boundaries. 7 vectorized compares, VPU-cheap.
    e = jnp.zeros_like(m)
    for k in range(7):
        e = e + (m >= jnp.int32(1 << (k + 8))).astype(jnp.int32)
    mant = jnp.right_shift(m, e + 3) & 0xF
    return (~(sign | jnp.left_shift(e, 4) | mant) & 0xFF).astype(jnp.uint8)


def ulaw_decode(code: np.ndarray) -> np.ndarray:
    """G.711 mu-law uint8 -> int16 PCM (host-side reference decoder for
    sinks and tests)."""
    c = (~np.asarray(code, np.uint8).astype(np.int32)) & 0xFF
    sign = c & 0x80
    e = (c >> 4) & 0x7
    mant = c & 0xF
    m = ((mant << 3) + 0x84) << e
    m = m - 0x84
    return np.where(sign != 0, -m, m).astype(np.int16)


@jax.jit
def _scatter_rows(stack: Score, offsets, jdeltas, rows: Score,
                  off_new, jd_new, idx):
    """Scatter K changed sessions' score rows (+offset counters + per-
    session jitter deltas) into the device-resident [N, E] stack: the
    incremental-upload path of StreamPool._prepare_tick (K is bucketed so
    at most log2(N) shapes compile). Duplicate idx entries carry identical
    rows (idempotent). jdeltas ride along so a live [voice:] switch (which
    changes one session's deltas) stays on this path instead of forcing
    the full [N, E] stack re-upload. (The carried jitter phase state never
    scatters here: feeds and score rebases do not move the jitter clock.)"""
    upd = jax.tree.map(lambda o, r: o.at[idx].set(r), stack, rows)
    jd2 = tuple(o.at[idx].set(r) for o, r in zip(jdeltas, jd_new))
    return (upd, offsets.at[idx].set(off_new), jd2)


@jax.jit
def _scatter_lat_rows(stack: JitterLattice, rows: JitterLattice, idx):
    """Scatter K slid sessions' jitter-lattice rows into the device-resident
    [N, cells, ...] stack. Staggered window slides mean one session slides
    per tick in steady state — without this, ANY slide re-stacked and
    re-uploaded every session's multi-MB lattice window (measured ~1.3 s
    per slid tick at N=128 on the serving frontend)."""
    return jax.tree.map(lambda o, r: o.at[idx].set(r), stack, rows)


@jax.jit
def _ulaw(audio):
    """f32 [-1,1] -> G.711 mu-law uint8 (see _ulaw_body)."""
    return _ulaw_body(audio)


@jax.jit
def _pcm16(audio):
    """f32 [-1,1] -> int16 PCM with the WAV encoder's Rust `as i16`
    semantics (truncate toward zero, saturate, NaN -> 0). Serving pools
    can emit this directly (StreamPool output='pcm16'): it is the format
    a sink ships anyway, and it HALVES the device->host audio bandwidth —
    on a remote-tunnel device link that is the difference between a
    sustainable and an unsustainable realtime fetch at large N."""
    return _pcm16_body(audio)


class StreamSession:
    """Incremental text -> audio session with carried DSP state."""

    def __init__(self, voice="generic", language="generic", seed: int = 0,
                 block: int = 1024, contour: bool = False,
                 speaking_rate: float = 1.0, jitter_horizon_s: float = 60.0):
        self.voice: Voice = get_voice(voice) if isinstance(voice, str) else voice
        self.language = get_language(language) if isinstance(language, str) else language
        self.block = int(block)
        self.contour = contour
        self.speaking_rate = speaking_rate
        self.sample_rate = float(self.voice.sample_rate)
        # jitter window: the lattice bucket is sized once for
        # `jitter_horizon_s` of stream and the jitter ORIGIN is rebased
        # (window slide, _maybe_rebase_jitter) whenever the position would
        # outgrow it — so unbounded sessions keep (a) a bounded lattice,
        # (b) a FIXED device shape (no mid-serving jit recompiles), and
        # (c) f32-exact sample positions (raw positions lose integer
        # precision past 2^24 samples ~ 6.3 min)
        inc = float(self.voice.jitter_frequency)
        self._jitter_reserve = _bucket(
            max(int(jitter_horizon_s * self.sample_rate * inc) + 8, 16))
        # Stagger jitter-window slides across sessions: the rebase trigger
        # is otherwise deterministic in (jitter_pos, inc), which all pooled
        # sessions share — every session would slide on the SAME tick,
        # N boundary re-sims + a full lattice restack/publish at once (the
        # idle-horizon twin of this, _ensure_audio_horizon, staggers for the
        # same reason). Seed-derived (not pool-index-derived) so a session
        # behaves identically solo and pooled; pool default seeds range(n)
        # spread the phases round-robin.
        self._jitter_stagger = int(seed) % max(1, self._jitter_reserve // 4)

        self._elements: List[PhonemeElem] = []   # always glide-merged
        self._rev = 0                # bumped whenever the rolling score
        #                              changes (StreamPool upload cache key)
        self._endn_key = None        # cache for _boundaries (per-tick host
        self._endn = None            # bookkeeping must not rebuild arrays)
        self._resid = None           # per-element drift residuals (cached
        #                              alongside _endn)
        self._drift_t0 = np.float32(0.0)  # f32 countdown residual carried
        #                              across rebases: keeps the remaining
        #                              elements' boundaries bit-identical
        #                              to the continuous stream's
        self._score_cache = {}       # {(rev, pad_to): Score} — the drift
        #                              sim + table gather re-ran for EVERY
        #                              pool session on ANY cache-key change
        self._horizon_tail = 0       # trailing auto-appended idle silence
        self._pool_ref = None        # (pool, index) when owned by a StreamPool
        self._consumed_samples = 0   # samples consumed within current score
        self._jitter_pos = 0         # absolute sample counter (jitter phase;
        #                              NEVER rebased — the exact schedule is
        #                              absolute, host ints stay exact)
        self._lat_base = 0           # absolute cell of lattice window row 0
        #                              (window slides advance it)
        self._jstate = None          # carried device (jphi, jcell) — lazily
        #                              (re)built from _jitter_pos (solo use;
        #                              pool-owned state lives in the pool)
        self._state = SynthState.init(())
        self._lattice = _IncrementalLattice(seed)
        self._pending_chars: List[str] = []
        self._pending_cmd = ""       # unterminated [command fragment held
        #                              across parse_commands=True feeds
        self._pending_clause = ""    # contour mode: unterminated clause text
        #                              held until punctuation/flush arrives
        self._lead_silence = True    # reference parity: transcribe() seeds
        #                              the phoneme buffer with one Silence
        #                              per utterance (src/lib.rs:1197-1204);
        #                              the session's first real text carries
        #                              it so stream == batch frontend
        #                              (contour clauses get theirs from
        #                              transcribe() in _append_clause)
        self._residual = np.empty(0, np.float32)  # unserved tail of last block

    # -- pool-lag sample counters -------------------------------------------
    # Pool ticks advance every session's two sample counters in lockstep.
    # Doing that eagerly was an O(N) host loop on the per-tick dispatch path
    # (the 64->128 aggregate-throughput residual, VERDICT r4 weak #6);
    # instead the pool accumulates ONE lag integer (StreamPool._lag_samples,
    # += blk per tick) and these properties fold it into every read, so all
    # consumers see the advanced value with zero per-tick per-session work.
    # Absolute writes subtract the current lag, so `s._consumed_samples -= n`
    # (rebase) and checkpoint restores keep exact semantics. Serve mode
    # keeps its own fold (_serve_build's _serve_synced) — the two lags never
    # run concurrently (read_block raises while serving).

    def _pool_lag(self) -> int:
        pr = self._pool_ref
        return 0 if pr is None else pr[0]._lag_samples

    @property
    def _consumed_samples(self) -> int:
        return self._consumed_base + self._pool_lag()

    @_consumed_samples.setter
    def _consumed_samples(self, v) -> None:
        self._consumed_base = int(v) - self._pool_lag()

    @property
    def _jitter_pos(self) -> int:
        return self._jitter_base + self._pool_lag()

    @_jitter_pos.setter
    def _jitter_pos(self, v) -> None:
        self._jitter_base = int(v) - self._pool_lag()

    def _bump_rev(self) -> None:
        """Every rolling-score mutation comes through here: bumps this
        session's revision (cache keys) and the owning pool's mutation
        counter (the O(1) steady-state tick fast path)."""
        self._rev += 1
        if self._pool_ref is not None:
            self._pool_ref[0]._mut += 1

    # -- frontend ----------------------------------------------------------

    def feed(self, text: str, parse_commands: bool = False) -> None:
        """Append text; transcription is greedy so a trailing partial match
        waits for more characters (buffered like the reference Peekable).

        With parse_commands=True, inline `[key:value]` tokens adjust live
        intonation — the reference's planned-but-unimplemented parser stage
        ("parser to parse text and handle potential commands",
        src/lib.rs:1366; README.md:19):

            [pitch:150]   center frequency in Hz for subsequent text
            [rate:1.5]    speaking rate multiplier
            [voice:name]  switch voice preset (same sample/jitter rates)
            [lang:name]   switch transcription language / prosody rules
            [[  /  ]]     literal '[' / ']'

        Malformed or unknown commands raise ValueError (grammar in
        docs/AUTHORING.md). A command split across feed() chunks ("[pit"
        then "ch:150]") is buffered until terminated, like partial
        transcription matches; an unterminated fragment at flush() is the
        loud error.
        """
        if parse_commands:
            combined = self._pending_cmd + text
            try:
                chunks, tail = _parse_commands(combined, partial=True)
                # validate every command BEFORE applying anything: a value
                # that parses but cannot apply ([rate:fast], [voice:nope])
                # must not half-consume the input — without the pre-pass,
                # a mid-loop failure dropped every chunk after it
                for kind, payload in chunks:
                    if kind != "text":
                        self._validate_command(kind, payload)
            except ValueError:
                # atomic: a malformed command consumes NOTHING — the whole
                # buffer (fragment + this chunk's text) stays pending so no
                # input is lost; the caller may recover by feeding the
                # missing ']' (or clearing _pending_cmd)
                self._pending_cmd = combined
                raise
            self._pending_cmd = tail
            for kind, payload in chunks:
                if kind == "text":
                    self.feed(payload)
                else:
                    self._apply_command(kind, payload)
            return
        if self.contour:
            # clause-typed prosody needs the clause TERMINATOR before any of
            # the clause can be intonated (question rise vs statement fall —
            # api.text_to_phoneme_elems semantics); buffer until punctuation
            # or flush() arrives
            from ..text.intonate import split_clauses_partial

            clauses, self._pending_clause = split_clauses_partial(
                self._pending_clause + text)
            for clause, kind, pause in clauses:
                self._append_clause(clause, kind, pause)
            return
        self._pending_chars.extend(text)
        # incremental automaton run: emits every match that is final
        # regardless of future input; a trailing extendable partial match is
        # held back until more text arrives or flush() declares end-of-input
        phonemes, consumed = transcribe_partial(
            "".join(self._pending_chars), self.language)
        self._pending_chars = self._pending_chars[consumed:]
        if phonemes and self._lead_silence:
            phonemes = [Phoneme.SILENCE] + list(phonemes)
            self._lead_silence = False
        self._append_phonemes(phonemes)

    def _validate_command(self, kind: str, value: str) -> None:
        """Raise ValueError if `value` cannot apply — side-effect free, so
        feed() can validate a whole chunk list before applying any of it
        (command atomicity), and registry KeyErrors surface as the
        documented ValueError."""
        if kind in ("pitch", "rate"):
            try:
                v = float(value)
            except ValueError:
                raise ValueError(
                    f"[{kind}:{value}]: expected a number") from None
            if not (v > 0):
                raise ValueError(f"[{kind}:{value}]: must be positive")
        elif kind == "voice":
            try:
                new = get_voice(value)
            except KeyError as e:
                raise ValueError(str(e)) from None
            if float(new.sample_rate) != self.sample_rate:
                raise ValueError("live voice switch requires equal sample rates")
            if abs(float(new.jitter_frequency)
                   - float(self.voice.jitter_frequency)) > 1e-12:
                # the jitter lattice's cell schedule is position * rate; a
                # mid-stream rate change would silently misalign every cell
                # already drawn (and trip the pool's shared-rate assert on
                # the serving frontend, stalling ALL sessions)
                raise ValueError("live voice switch requires equal jitter rates")
        elif kind == "lang":
            try:
                get_language(value)
            except KeyError as e:
                raise ValueError(str(e)) from None
        else:
            raise ValueError(f"unknown stream command {kind!r}")

    def _apply_command(self, kind: str, value: str) -> None:
        import dataclasses

        self._validate_command(kind, value)
        self.flush()  # pending text keeps the pre-command settings
        if kind == "pitch":
            self.voice = dataclasses.replace(
                self.voice, center_frequency=float(value) / self.sample_rate)
        elif kind == "rate":
            self.speaking_rate = float(value)
        elif kind == "voice":
            self.voice = get_voice(value)
        elif kind == "lang":
            # pending chars were flushed above under the OLD language; text
            # after the command transcribes (and intonates) with the new one
            self.language = get_language(value)
        # voice/prosody changes must invalidate the pool's upload cache even
        # with no pending text: the cache key's id(voice) component alone is
        # unsafe (a garbage-collected Voice's id can be reused)
        self._bump_rev()

    def flush(self) -> None:
        """Force-transcribe any held-back characters; a command fragment
        still unterminated at end-of-input raises (strict grammar)."""
        if self._pending_cmd:
            # parse + validate BEFORE clearing: on a ValueError the fragment
            # stays buffered, so the caller can still terminate/fix it
            chunks = _parse_commands(self._pending_cmd)
            for kind, payload in chunks:
                if kind != "text":
                    self._validate_command(kind, payload)
            self._pending_cmd = ""
            for kind, payload in chunks:
                if kind == "text":
                    self.feed(payload)
                else:
                    self._apply_command(kind, payload)
        if self._pending_clause:
            from ..text.intonate import split_clauses_partial

            clauses, tail = split_clauses_partial(self._pending_clause,
                                                  final=True)
            self._pending_clause = ""
            for clause, kind, pause in clauses:
                self._append_clause(clause, kind, pause)
            tail = tail.strip()
            if tail:   # unterminated final clause: statement, no pause
                self._append_clause(tail, "statement", None)
        if self._pending_chars:
            phonemes = list(transcribe_chars("".join(self._pending_chars), self.language))
            self._pending_chars = []
            if phonemes and self._lead_silence:
                phonemes = [Phoneme.SILENCE] + phonemes
                self._lead_silence = False
            self._append_phonemes(phonemes)

    def _append_clause(self, clause: str, kind: str, pause) -> None:
        """Contour mode: transcribe + intonate one terminated clause with
        its type and append the trailing pause silence — the exact
        api.text_to_phoneme_elems clause treatment (including transcribe()'s
        reference-parity leading Silence per clause), so streamed contour
        prosody matches the one-shot frontend's."""
        from ..text.transcribe import transcribe

        self._append_phonemes(transcribe(clause, self.language),
                              clause=kind, pause=pause)

    def _append_phonemes(self, phonemes, clause: str = "statement",
                         pause=None) -> None:
        if not phonemes:
            return
        pelems = list(intonate(phonemes, self.language, self.voice,
                               contour=self.contour,
                               speaking_rate=self.speaking_rate,
                               clause=clause))
        if pause is not None:
            rate = max(self.speaking_rate, 1e-3)
            dur = (self.language.intonation.comma_pause if pause == "comma"
                   else self.language.intonation.sentence_pause) / rate
            pelems.append(PhonemeElem(Phoneme.SILENCE, dur,
                                      min(0.5 * dur, 0.06 / rate),
                                      self.voice.center_frequency))
        self._trim_horizon_tail()
        # glide-merge at append time so the rolling element list is 1:1
        # with the device score's rows (merge_glides only ever folds an
        # element into its immediate predecessor, so one element of
        # context suffices; re-merging a merged list is a no-op)
        from ..synth.score import merge_glides

        tail = self._elements[-1:]
        merged = merge_glides(tail + list(pelems))
        self._elements = self._elements[:len(self._elements) - len(tail)] + merged
        self._bump_rev()

    def _trim_horizon_tail(self) -> None:
        """Drop auto-appended trailing silence that has not started playing,
        keeping the immediate next element (the current element's crossfade
        target). The bulk idle-horizon append pre-schedules seconds of
        silence for upload-cache stability; without this trim, text fed
        after an idle period would only start AFTER that pre-scheduled
        silence (seconds of dead air instead of ~one block of latency)."""
        t = min(self._horizon_tail, len(self._elements))
        if t <= 0:
            self._horizon_tail = 0
            return
        n = self._end_samples()
        E = len(self._elements)
        keep = self._consumed_samples
        drop = 0
        while drop < t:
            i = E - 1 - drop
            start = int(n[i - 1]) if i > 0 else 0
            if start <= keep:       # started / current element: keep
                break
            prev_start = int(n[i - 2]) if i > 1 else 0
            if prev_start <= keep:  # i is the current element's blend
                break               # target: keep one for continuity
            drop += 1
        if drop:
            self._elements = self._elements[:E - drop]
            self._bump_rev()
        self._horizon_tail = 0

    def _end_samples(self) -> np.ndarray:
        """Cumulative element end-samples [E] int64, in the SAME boundary
        convention the device score uses: the reference's drifting f32
        countdown (score.py:_reference_boundary_samples, seeded with the
        rebase-carried residual). Host bookkeeping (horizon sizing, tail
        trimming, rebase arithmetic) and the device score therefore share
        one boundary per element — the raw floor(cumsum*sr) convention
        previously used here drifted ~5 samples/s away from the score's
        retargeted lengths. Cached on _rev: every score mutation path
        (feed, horizon append, rebase, load_state) bumps it — that is the
        documented contract. StreamPool's per-tick bookkeeping calls this
        for every session every tick."""
        return self._boundaries()[0]

    def _boundaries(self):
        """(end_samples [E] int64, drift residuals [E] f32), cached on _rev.

        Incremental across revisions: the drift sim is a left-to-right f32
        fold whose per-element residuals ARE the continuation seeds, so a
        mutation that only appends/truncates elements (feed, idle-horizon
        append, tail trim — the common serving paths) re-simulates ONLY
        past the longest unchanged prefix. A rebase changes _drift_t0 and
        drops the front, which resets the prefix — the remaining list is
        short then anyway."""
        from ..synth.score import _reference_boundary_samples

        key = self._rev
        if self._endn_key != key:
            lengths = np.asarray([e.length for e in self._elements],
                                 np.float32)
            prev = getattr(self, "_endn_lengths", None)
            m = 0
            if (prev is not None and len(prev)
                    and getattr(self, "_endn_t0", None)
                    == np.float32(self._drift_t0).tobytes()):
                k = min(len(prev), len(lengths))
                neq = np.nonzero(prev[:k].view(np.uint32)
                                 != lengths[:k].view(np.uint32))[0]
                m = int(neq[0]) if len(neq) else k
            if len(lengths) == 0:
                self._endn = np.zeros(1, np.int64)
                self._resid = np.zeros(0, np.float32)
            elif m == len(lengths):          # pure truncation
                self._endn = self._endn[:m]
                self._resid = self._resid[:m]
            elif m > 0:
                endn_sfx, resid_sfx = _reference_boundary_samples(
                    lengths[m:], self.sample_rate,
                    t0=float(self._resid[m - 1]))
                self._endn = np.concatenate(
                    [self._endn[:m], endn_sfx + self._endn[m - 1]])
                self._resid = np.concatenate([self._resid[:m], resid_sfx])
            else:
                self._endn, self._resid = _reference_boundary_samples(
                    lengths, self.sample_rate, t0=float(self._drift_t0))
            self._endn_lengths = lengths
            self._endn_t0 = np.float32(self._drift_t0).tobytes()
            self._endn_key = key
            self._score_cache.clear()
        return self._endn, self._resid

    def _build_score(self, pad_to: int) -> Score:
        """Device Score for the current elements, built from the cached
        boundary sim (one drift simulation per revision, one table gather
        per (revision, pad) — a pool cache-key change previously re-ran
        both for every session every tick)."""
        key = (self._rev, pad_to)
        score = self._score_cache.get(key)
        if score is None:
            n_ref, _ = self._boundaries()
            score = score_from_phoneme_elems(
                self._elements, self.voice, pad_to=pad_to,
                n_ref=n_ref if self._elements else None)
            self._score_cache[key] = score
        return score

    def _ensure_audio_horizon(self, samples_needed: int) -> None:
        """Idle behavior: extend with Silence elements (the reference's
        repeat_with(' ') -> Silence path) until the score covers the read.

        Appends in BULK (several seconds at once): every append bumps the
        score revision, and the StreamPool upload cache is keyed on
        revisions — one element per tick would force a full table
        re-upload on nearly every tick of an idle session. Trailing
        silence elements are semantically idempotent (after the first one
        completes the fade-out, the rest render exact silence), so
        over-appending never changes the audio."""
        deficit = (samples_needed
                   - (int(self._end_samples()[-1]) - self._consumed_samples))
        if deficit <= 0:
            return
        # We are about to bump the revision anyway — shed consumed elements
        # first so an idle session's element count converges to a steady
        # state instead of oscillating across a jit bucket boundary
        # (append-grow / rebase-shrink cycles were forcing tick recompiles).
        self._rebase(min_drop=0)
        margin = max(4 * samples_needed, int(2 * self.sample_rate))
        # pooled sessions stagger their horizon expiry (index-derived
        # phase): sessions fed together otherwise all re-append on the
        # SAME tick, turning a ~13 KB incremental row upload into a
        # thundering-herd full-stack rebuild on the serving frontend
        if self._pool_ref is not None:
            i = self._pool_ref[1]
            margin += int((i % 32) * 0.125 * self.sample_rate)
        n_el = -(-(deficit + margin) // int(0.5 * self.sample_rate))
        sil = PhonemeElem(Phoneme.SILENCE, 0.5, 0.5,
                          self.voice.center_frequency)
        self._elements.extend([sil] * n_el)
        self._horizon_tail += n_el   # trimmed when real text arrives
        self._bump_rev()

    def _rebase(self, min_drop: int = 8) -> None:
        """Drop fully-consumed elements to keep the jit score bucket small.

        `min_drop` batches revision bumps (every bump invalidates the pool
        upload cache); pass 0 when a bump is happening anyway."""
        if not self._elements:
            return
        n, resid = self._boundaries()
        # keep one consumed element of margin (its params blend into the next)
        drop = int(np.searchsorted(n, self._consumed_samples, side="right"))
        drop = max(0, drop - 1)
        if drop > min_drop:
            self._elements = self._elements[drop:]
            self._consumed_samples -= int(n[drop - 1])
            # carry the countdown residual at the drop point so the
            # remaining elements' boundaries stay bit-identical to the
            # continuous (never-rebased) stream's
            self._drift_t0 = np.float32(resid[drop - 1])
            self._bump_rev()

    def _cell_bound(self, pos: int) -> int:
        """Cheap upper bound on the exact absolute cell at sample `pos`:
        floor(pos*inc) + 1 (phase-origin offset) + the accumulated f32
        phase drift, measured at ~1.7e-9 cells/sample (schedule.py) and
        over-covered by pos >> 28 (~3.7e-9/sample) + 1. Integer math only —
        used by the PER-TICK sizing/slide triggers so they never run the
        schedule simulation; the exact cell is computed only when a slide
        actually fires."""
        return int(pos * float(self.voice.jitter_frequency)) + 2 + (pos >> 28)

    def _jitter_cells(self, blk: int) -> int:
        """Lattice rows (window-relative) needed for the next `blk` samples;
        normally the fixed reserve (shape-stable), growing only if a caller
        reads more than the horizon in one call."""
        need = self._cell_bound(self._jitter_pos + blk + 1) - self._lat_base + 4
        if need > self._jitter_reserve:
            self._jitter_reserve = _bucket(need)
        return self._jitter_reserve

    def _jitter_state_host(self):
        """Exact (phase f32, absolute cell int) at self._jitter_pos, from
        the shared checkpointed schedule (called on (re)build events —
        slides, restores, pool scatters — never per tick)."""
        from ..synth.schedule import get_schedule

        return get_schedule(self.voice.jitter_frequency).state_at(
            self._jitter_pos)

    def _maybe_rebase_jitter(self, blk: int) -> None:
        """Slide the jitter LATTICE window when the next read would outgrow
        the reserve: drop the K passed cells and advance _lat_base by K.
        The jitter phase itself is untouched — it is the absolute carried
        recurrence state (exact by construction); only the window of
        lattice rows (and the lat_base coordinate that maps absolute cells
        onto it) changes, riding the lattice upload cache. Deterministic in
        (jitter_pos, inc, seed), so a session slides identically solo and
        pooled; the seed-derived stagger spreads different sessions' slides
        across ticks (see __init__)."""
        need = self._cell_bound(self._jitter_pos + blk + 1) - self._lat_base + 4
        if need + self._jitter_stagger <= self._jitter_reserve:
            return
        _, cell_abs = self._jitter_state_host()
        K = cell_abs - self._lat_base - 4
        if K <= 0:
            return           # nothing to slide: _jitter_cells grows instead
        self._lattice.ensure(K + 1)   # never drop cells not yet generated
        self._lattice.drop(K)
        self._lat_base += K  # lattice version bump re-uploads window + base

    def _quiet_horizon(self, blk: int) -> int:
        """Largest absolute _jitter_pos at which a tick of `blk` samples
        still runs NO per-session maintenance: _ensure_audio_horizon's
        deficit stays <= 0, _maybe_rebase_jitter's slide trigger stays
        false, and _jitter_cells cannot grow the reserve. Every trigger is
        a monotone function of the session's sample position, which
        advances uniformly with ticks — so the pool can skip the whole
        O(N) maintenance loop until the earliest session's bound
        (StreamPool._prepare_tick fast path; VERDICT r3 weak #4: this loop
        is what made the per-tick dispatch cost scale with N)."""
        pos = self._jitter_pos
        if not self._elements:
            return pos          # nothing buffered: maintain every tick
        # audio horizon: deficit(p) = blk - (end - consumed(p)) with
        # consumed advancing alongside p
        q = pos + (int(self._end_samples()[-1])
                   - self._consumed_samples) - blk
        # jitter window: quiet while need(p) + stagger <= reserve, with
        # need(p) = _cell_bound(p + blk + 1) - lat_base + 4 monotone in p.
        # _cell_bound(x) - 2 = int(x*inc) + (x >> 28) <= x*(inc + 2^-28),
        # so x <= budget/(inc + 2^-28) is conservative; a direct trigger
        # evaluation at the bound confirms it (monotonicity extends the
        # guarantee to every smaller position).
        budget = (self._jitter_reserve - self._jitter_stagger - 6
                  + self._lat_base)
        inc = float(self.voice.jitter_frequency)
        p_j = int(budget / (inc + 2.0 ** -28)) - blk - 1 if budget > 0 else 0
        if (p_j <= pos
                or self._cell_bound(p_j + blk + 1) - self._lat_base + 4
                + self._jitter_stagger > self._jitter_reserve):
            return pos          # at/near the slide trigger: no skipping
        return min(q, p_j)

    # -- audio -------------------------------------------------------------

    def read(self, num_samples: Optional[int] = None) -> np.ndarray:
        """Synthesize the next `num_samples` (default one block).

        Synthesis advances in whole blocks; samples beyond the requested
        count are kept in a residual buffer and served by the next read, so
        arbitrary read sizes are gap-free."""
        if self._pool_ref is not None:
            raise RuntimeError(
                "session is owned by a StreamPool: read audio via "
                "pool.read_block() — a solo read would advance only this "
                "session's host state and desynchronize it from the pool's "
                "device-resident batch state")
        n = self.block if num_samples is None else int(num_samples)
        out = np.empty(n, np.float32)
        done = 0
        while done < n:
            if len(self._residual) == 0:
                self._residual = self._read_block()
            take = min(len(self._residual), n - done)
            out[done:done + take] = self._residual[:take]
            self._residual = self._residual[take:]
            done += take
        return out

    def _materialize_state(self) -> None:
        """Pool-owned sessions keep their DSP state inside the pool's stacked
        device pytree (per-session slicing would dispatch 5 x N tiny device
        ops per tick); pull this session's slice only when actually needed
        (solo reads, checkpointing)."""
        if self._pool_ref is not None:
            pool, idx = self._pool_ref
            self._state = SynthState(*(x[idx] for x in pool._states))

    def _jitter_state_dev(self):
        """The carried device (jphi, jcell) for solo reads — built from the
        host schedule on first use / after restores, then device-advanced
        by every block (zero per-block schedule work)."""
        if self._jstate is None:
            phase, cell = self._jitter_state_host()
            self._jstate = (jnp.float32(phase), jnp.int32(cell))
        return self._jstate

    def _read_block(self) -> np.ndarray:
        self._materialize_state()
        blk = self.block
        self._ensure_audio_horizon(blk)
        self._rebase()
        self._maybe_rebase_jitter(blk)

        E = _bucket(len(self._elements))
        score = self._build_score(E)

        inc = self.voice.jitter_frequency
        cells = self._jitter_cells(blk)
        self._lattice.ensure(cells)
        lattice = JitterLattice(self._lattice.pitch[:cells],
                                self._lattice.formant[:cells],
                                self._lattice.amp[:cells])

        jparams = (jnp.float32(inc), jnp.float32(self.voice.jitter_delta_frequency),
                   jnp.float32(self.voice.jitter_delta_formant_frequency),
                   jnp.float32(self.voice.jitter_delta_amplitude))
        out, self._state, self._jstate = _stream_block(
            score, lattice, jparams, jnp.float32(self.sample_rate),
            jnp.int32(self._consumed_samples), self._jitter_state_dev(),
            jnp.int32(self._lat_base), self._state, blk)
        self._consumed_samples += blk
        self._jitter_pos += blk
        return np.asarray(out, np.float32)

    # -- checkpoint / resume ----------------------------------------------
    #
    # The reference's "resume" is implicit iterator state (SURVEY.md §5:
    # phase, 3 filter arrays, RNG seed, src/lib.rs:470-488). Here the whole
    # session — rolling score, sample counters, DSP state, jitter lattice
    # continuations — serializes to one npz payload.

    def _payload_dict(self, state: SynthState) -> dict:
        """Flat array dict of the full session state (score + counters +
        DSP state + lattice continuations) — shared by the solo and
        pool-level checkpoint formats."""
        elems = np.array([(int(e.phoneme), e.length, e.blend_length, e.frequency)
                          for e in self._elements], np.float64).reshape(-1, 4)
        return dict(
            elems=elems,
            counters=np.array([self._consumed_samples, self._jitter_pos,
                               self._lat_base], np.int64),
            drift_t0=np.float32(self._drift_t0),
            phase=np.asarray(state.phase),
            lp=np.asarray(state.filter_state_a),
            fb=np.asarray(state.filter_state_b),
            fc=np.asarray(state.filter_state_c),
            seed=np.asarray(state.seed),
            lat_pitch=self._lattice.pitch,
            lat_formant=self._lattice.formant,
            lat_amp=self._lattice.amp,
            lat_states=np.array([self._lattice._pitch_state.state,
                                 self._lattice._formant_state.state,
                                 self._lattice._amp_state.state], np.uint32),
            pending=np.frombuffer("".join(self._pending_chars).encode(), np.uint8),
            pending_cmd=np.frombuffer(self._pending_cmd.encode(), np.uint8),
            pending_clause=np.frombuffer(self._pending_clause.encode(),
                                         np.uint8),
            residual=self._residual,
            # live-command state: a session that executed [voice:]/[pitch:]/
            # [rate:]/[lang:] must restore with those settings, not the
            # restoring session's constructor defaults; _horizon_tail keeps
            # restored idle silence trimmable (text fed right after a
            # restore must not play seconds late)
            voice_name=np.frombuffer(self.voice.name.encode(), np.uint8),
            lang_name=np.frombuffer(self.language.name.encode(), np.uint8),
            prosody=np.array([self.voice.center_frequency,
                              self.speaking_rate, self.sample_rate,
                              float(self.contour),
                              float(self._lead_silence)], np.float64),
            horizon=np.int64(self._horizon_tail),
        )

    def _apply_payload(self, z, prefix: str = "") -> None:
        """Restore session state from a dict-like of arrays (npz archive),
        keys optionally prefixed (pool-level payloads pack N sessions into
        one archive). Does NOT scatter into a pool's stacked device state —
        callers handle that (load_state per-session, StreamPool.load in
        one stacked upload)."""
        def g(k):
            return z[prefix + k]

        def has(k):
            try:
                return (prefix + k) in z
            except TypeError:
                return (prefix + k) in z.files

        import dataclasses

        if has("voice_name"):
            vn = bytes(np.asarray(g("voice_name"), np.uint8)).decode()
            pros = [float(x) for x in g("prosody")]
            cf, rate, sr, contour = pros[:4]
            # older checkpoints (4-value prosody) are mid-session by
            # construction: their leading silence was already emitted
            self._lead_silence = bool(pros[4]) if len(pros) > 4 else False
            if vn and vn != self.voice.name:
                try:
                    v = get_voice(vn)
                except KeyError:
                    raise ValueError(
                        f"checkpoint used voice {vn!r}, which is not "
                        "registered here; register_voice() it before "
                        "load_state()") from None
                self.voice = v
            if float(self.voice.sample_rate) != sr:
                self.voice = self.voice.resampled(sr)
            if cf != float(self.voice.center_frequency):   # live [pitch:]
                self.voice = dataclasses.replace(
                    self.voice, center_frequency=cf)
            self.sample_rate = float(self.voice.sample_rate)
            self.speaking_rate = rate
            self.contour = bool(contour)
            ln = bytes(np.asarray(g("lang_name"), np.uint8)).decode()
            if ln and ln != self.language.name:
                try:
                    self.language = get_language(ln)
                except KeyError:
                    raise ValueError(
                        f"checkpoint used language {ln!r}, which is not "
                        "registered here; register_language() it before "
                        "load_state()") from None
        self._elements = [
            PhonemeElem(Phoneme(int(r[0])), float(r[1]), float(r[2]), float(r[3]))
            for r in g("elems")]
        self._bump_rev()   # restored score invalidates pool/end-sample caches
        self._horizon_tail = int(g("horizon")) if has("horizon") else 0
        self._drift_t0 = np.float32(g("drift_t0")) if has("drift_t0") \
            else np.float32(0.0)
        self._consumed_samples = int(g("counters")[0])
        self._jitter_pos = int(g("counters")[1])
        c = np.asarray(g("counters"))
        self._lat_base = int(c[2]) if c.shape[0] > 2 else 0
        self._jstate = None   # carried jitter state rebuilds from counters
        self._state = SynthState(
            phase=jnp.asarray(g("phase")),
            filter_state_a=jnp.asarray(g("lp")),
            filter_state_b=jnp.asarray(g("fb")),
            filter_state_c=jnp.asarray(g("fc")),
            seed=jnp.asarray(g("seed")),
        )
        self._lattice.pitch = g("lat_pitch")
        self._lattice.formant = g("lat_formant")
        self._lattice.amp = g("lat_amp")
        # a restored window may exceed the constructor-sized reserve (e.g.
        # restoring into a session built with a smaller jitter_horizon_s)
        self._jitter_reserve = max(self._jitter_reserve,
                                   _bucket(len(self._lattice.pitch)))
        self._lattice.version += 1   # restored content invalidates uploads
        st = g("lat_states")
        self._lattice._pitch_state.state = int(st[0])
        self._lattice._formant_state.state = int(st[1])
        self._lattice._amp_state.state = int(st[2])
        self._pending_chars = list(bytes(g("pending")).decode())
        self._pending_cmd = bytes(g("pending_cmd")).decode() \
            if has("pending_cmd") else ""
        self._pending_clause = bytes(g("pending_clause")).decode() \
            if has("pending_clause") else ""
        self._residual = np.asarray(g("residual"), np.float32) if has("residual") \
            else np.empty(0, np.float32)

    def _check_not_serving(self, what: str) -> None:
        """Pool-owned sessions share StreamPool.save/load's torn-state
        hazard: while serve mode is live, host counters sync only at
        frontend cycles and the RT thread replaces pool._states each tick."""
        if self._pool_ref is not None and getattr(
                self._pool_ref[0], "_serving", False):
            raise RuntimeError(
                f"{what} on a pool-owned session while serve mode is live "
                "would snapshot/restore a torn state; call "
                "pool.serve_stop() first")

    def save_state(self) -> bytes:
        import io

        self._check_not_serving("save_state()")
        self._materialize_state()
        buf = io.BytesIO()
        np.savez(buf, **self._payload_dict(self._state))
        return buf.getvalue()

    def load_state(self, payload: bytes) -> None:
        import io

        self._check_not_serving("load_state()")
        z = np.load(io.BytesIO(payload))
        self._apply_payload(z)
        if self._pool_ref is not None:
            # pool-owned: the pool reads DSP state from its stacked device
            # pytree, so the restored slice must be scattered back (and the
            # cached device offsets rebuilt from the restored counters)
            pool, idx = self._pool_ref
            if getattr(pool, "_inflight", None) is not None:
                pool.drain()   # an in-flight tick was dispatched pre-restore
            pool._states = SynthState(*(
                jnp.asarray(arr).at[idx].set(jnp.asarray(v))
                for arr, v in zip(pool._states, self._state)))
            # rebuild this session's carried jitter state from the restored
            # counters (the exact schedule is deterministic in position)
            phase, cell = self._jitter_state_host()
            pool._jstates = (
                pool._jstates[0].at[idx].set(jnp.float32(phase)),
                pool._jstates[1].at[idx].set(jnp.int32(cell)))
            pool._cache_key = None
            pool._lat_key = None

    @property
    def pending_seconds(self) -> float:
        end = int(self._end_samples()[-1]) if self._elements else 0
        return max(0.0, (end - self._consumed_samples) / self.sample_rate)


class StreamPool:
    """N concurrent streaming sessions, one batched device program per tick.

    The serving shape: each tick synthesizes the next `block` samples for
    every live session in a single jit-compiled batch (Pallas kernel when N
    is a lane multiple, associative-scan core otherwise). Session frontends
    (feed/flush/commands/rebasing) stay per-session and host-side.

    Usage:
        pool = StreamPool(8, voice="plain", language="english")
        pool.feed(3, "hello")
        audio = pool.read_block()      # [8, block]
    """

    def __init__(self, n: int, voice="generic", language="generic",
                 block: int = 1024, seeds=None, contour: bool = False,
                 speaking_rate: float = 1.0, backend: Optional[str] = None,
                 mesh=None, output: str = "f32",
                 pin_elems: Optional[int] = None,
                 jitter_horizon_s: float = 60.0):
        if output not in ("f32", "pcm16", "ulaw"):
            raise ValueError(
                f"output must be 'f32', 'pcm16' or 'ulaw', got {output!r}")
        self.output = output
        # Strict-deadline serving: pin the element-count bucket so the tick
        # jit shape NEVER changes mid-serving. Without a pin, a session
        # crossing a power-of-two element count (long feed, or the
        # idle-horizon append after text drains) changes E for the whole
        # pool -> every session's score rebuilds AND the tick recompiles
        # (a multi-second stall on TPU: measured 2 s, docs/SERVING.md).
        # Size it to the largest horizon the deployment feeds; it grows
        # (with a recompile) only if that is exceeded.
        self.pin_elems = int(pin_elems) if pin_elems else 0
        seeds = list(seeds) if seeds is not None else list(range(n))
        # jitter_horizon_s sizes each session's device-resident lattice
        # window (reserve rows = horizon * sr * jitter_rate); smaller
        # horizons shrink the per-session upload at the cost of more
        # frequent (staggered) window slides
        self.sessions = [
            StreamSession(voice=voice, language=language, seed=seeds[i],
                          block=block, contour=contour,
                          speaking_rate=speaking_rate,
                          jitter_horizon_s=jitter_horizon_s)
            for i in range(n)
        ]
        self.n = n
        self.block = block
        self.sample_rate = self.sessions[0].sample_rate
        if backend is None:
            from ..api import default_backend

            backend = default_backend()
        if backend not in ("fused", "fused_interpret", "xla"):
            # unknown strings must not silently run the xla tick — a pool
            # deployed as "the fused kernel" would serve ~100x slower
            raise ValueError(f"StreamPool backend must be 'fused', "
                             f"'fused_interpret' or 'xla', got {backend!r}")
        # the fused kernel needs whole chunks per tick
        from ..synth.kernel_fused import CHUNK_F

        if backend.startswith("fused") and block % CHUNK_F != 0:
            backend = "xla"
        self.backend = backend
        # multi-chip serving: sessions shard over mesh axis 'data'; each
        # chip runs the fused tick on its local slice (no collectives).
        # See parallel.sharded.sharded_stream_tick_fn for sizing guidance.
        self.mesh = mesh
        self._sharded_ticks = {}   # {samples: jitted sharded tick fn}
        if mesh is not None:
            if not backend.startswith("fused"):
                raise ValueError("mesh-sharded StreamPool requires the "
                                 "fused backend (got %r)" % backend)
            nd = mesh.shape["data"]
            if n % nd != 0:
                raise ValueError(f"n={n} sessions must divide over "
                                 f"mesh data axis ({nd})")
        # DSP state lives DEVICE-RESIDENT as one stacked [N, ...] pytree:
        # per-session host pulls cost a fixed ~30 ms tunnel round trip EACH
        # on the axon platform (5 fields x N sessions = seconds per tick).
        self._states = SynthState.init((n,))
        # carried jitter phase state (jphi f32 [N], jcell i32 [N] ABSOLUTE
        # cell): advanced on device by every tick exactly like the DSP
        # state; rebuilt from host counters only on restores. Sessions all
        # start at jitter position 0 -> state (0.0, 0).
        self._jstates = (jnp.zeros((n,), jnp.float32),
                         jnp.zeros((n,), jnp.int32))
        # uploaded-input cache: in steady state (no new text, no rebase) a
        # tick re-dispatches with the SAME device-resident scores/lattices
        # and device-advanced offsets — zero host->device transfers
        self._cache_key = None
        self._dev = None
        self._lat_key = None         # separate lattice upload cache (feeds
        self._lat_dev = None         # must not re-upload the lattice window)
        self._lat_base_dev = None    # [N] i32 absolute cell of window row 0
        #                              (rides the lattice cache: must publish
        #                              atomically with the window content)
        self._inflight = None        # depth-2 pipeline: the dispatched-but-
        #                              unfetched tick (see tick_pipelined)
        self._quiet = None           # (until_pos, blk, E, cells, pin) —
        #                              position bound below which the
        #                              per-session maintenance loop is a
        #                              proven no-op (_quiet_horizon)
        self._mut = 0                # bumped by every session mutation
        #                              (_bump_rev); the O(1) steady-state
        #                              fast-path check in _prepare_tick
        self._quiet_mut = -1         # _mut snapshot when _dev was last
        #                              validated (armed at _prepare_tick
        #                              exit, AFTER maintenance rev bumps)
        self._lag_samples = 0        # pool ticks advance all sessions'
        #                              sample counters in lockstep; the lag
        #                              folds into every read via the
        #                              StreamSession counter properties
        #                              (O(1) per tick instead of O(N))
        self._srj = jnp.float32(self.sample_rate)
        for i, s in enumerate(self.sessions):
            s._pool_ref = (self, i)

    def _feed_lock(self):
        """The frontend lock while serve mode is live, else a no-op: feeds
        must not mutate session element lists mid-_serve_build. Gated on
        the _serving flag (set BEFORE serve_start's initial build/warm-up,
        not on thread creation) so there is no unlocked window while the
        multi-second first build runs."""
        import contextlib

        return (getattr(self, "_serve_lock", None)
                if getattr(self, "_serving", False)
                else None) or contextlib.nullcontext()

    def feed(self, i: int, text: str, parse_commands: bool = False) -> None:
        with self._feed_lock():
            self.sessions[i].feed(text, parse_commands=parse_commands)

    def flush(self, i: Optional[int] = None) -> None:
        with self._feed_lock():
            for s in (self.sessions if i is None else [self.sessions[i]]):
                s.flush()

    def _prepare_tick(self, samples=None):
        """Host frontend + (cached) device upload for one tick of `samples`
        (default one block).

        Two independent upload caches: scores/offsets (invalidated by any
        session revision — every feed) and the jitter lattices
        (invalidated only when a lattice's content changes: first sizing
        and the rare window slides). A feed therefore re-uploads ~E rows
        per session, not the multi-MB lattice window."""
        blk = self.block if samples is None else int(samples)
        # Fast path: while every session's position is below its proven
        # quiet horizon AND no session has mutated since the cached device
        # inputs were validated, the maintenance loop below is a no-op.
        # The mutation check is ONE integer compare (pool._mut, bumped by
        # every _bump_rev — feeds, rebases, commands, restores), making the
        # steady-state serving tick O(1) on the host instead of O(N) tuple
        # builds (the 64->128 aggregate residual, VERDICT r4 weak #6).
        # NOTE: a DIRECT `session.voice = v` assignment (bypassing the
        # command/API paths, which all bump _rev) is now observed at the
        # next mutation or quiet-horizon expiry rather than the next tick.
        q = self._quiet
        if (q is not None and q[1] == blk and q[4] == self.pin_elems
                and self._mut == self._quiet_mut
                and self.sessions[0]._jitter_pos <= q[0]):
            return self._dev
        self._quiet = None
        dev = self._prepare_tick_full(blk)
        # arm AFTER the full pass: maintenance itself bumps revs (rebases)
        self._quiet_mut = self._mut
        return dev

    def _prepare_tick_full(self, blk: int):
        """The full maintenance + upload pass behind _prepare_tick."""
        E = max(16, _bucket(self.pin_elems)) if self.pin_elems else 16
        for s in self.sessions:
            s._ensure_audio_horizon(blk)
            s._rebase()
            s._maybe_rebase_jitter(blk)
            E = max(E, _bucket(len(s._elements)))
        v0 = self.sessions[0].voice
        inc = float(v0.jitter_frequency)
        cells = 16
        for s in self.sessions:
            cells = max(cells, s._jitter_cells(blk))
        # store as session-0-relative: all pool sessions advance in
        # lockstep (per-tick += blk), but their ABSOLUTE positions may
        # differ after a session-level restore — min over per-session
        # slack is invariant to that (and any restore bumps _rev, which
        # the fast path's key compare catches before trusting the bound)
        self._quiet = (self.sessions[0]._jitter_pos
                       + min(s._quiet_horizon(blk) - s._jitter_pos
                             for s in self.sessions),
                       blk, E, cells, self.pin_elems)

        key = (E, tuple(s._rev for s in self.sessions),
               tuple(id(s.voice) for s in self.sessions))
        lat_key = (cells, tuple(s._lattice.version for s in self.sessions))
        if key == self._cache_key and lat_key == self._lat_key:
            return self._dev      # steady state: nothing to upload

        if lat_key != self._lat_key:
            prev_lat = self._lat_key
            # Incremental lattice scatter: window slides are staggered, so
            # in steady state ONE session's version bumps per tick — upload
            # just that session's window rows and scatter on device (the
            # full [N, cells, ...] restack + re-upload is the multi-second
            # frontend spike at large N).
            changed_lat = ([i for i in range(self.n)
                            if prev_lat[1][i] != lat_key[1][i]]
                           if (prev_lat is not None and self._lat_dev
                               is not None and prev_lat[0] == cells)
                           else None)
            if changed_lat is not None and 0 < len(changed_lat) <= min(8, self.n):
                for i in changed_lat:
                    self.sessions[i]._lattice.ensure(cells)
                K = _scatter_bucket(len(changed_lat))
                idx = np.asarray(
                    changed_lat + changed_lat[:1] * (K - len(changed_lat)),
                    np.int32)
                rows = JitterLattice(
                    np.stack([self.sessions[i]._lattice.pitch[:cells]
                              for i in idx]),
                    np.stack([self.sessions[i]._lattice.formant[:cells]
                              for i in idx]),
                    np.stack([self.sessions[i]._lattice.amp[:cells]
                              for i in idx]),
                )
                base_rows = jnp.asarray(
                    [self.sessions[i]._lat_base for i in idx], jnp.int32)
                self._lat_dev, self._lat_base_dev = _scatter_lat_rows(
                    (self._lat_dev, self._lat_base_dev),
                    (jax.device_put(rows), base_rows), jnp.asarray(idx))
            else:
                for s in self.sessions:
                    s._lattice.ensure(cells)
                lattices = JitterLattice(
                    np.stack([s._lattice.pitch[:cells]
                              for s in self.sessions]),
                    np.stack([s._lattice.formant[:cells]
                              for s in self.sessions]),
                    np.stack([s._lattice.amp[:cells]
                              for s in self.sessions]),
                )
                self._lat_dev = jax.device_put(lattices)
                # lat_base rides the lattice cache: it maps absolute carried
                # cells onto window rows, so it must change ATOMICALLY with
                # the window content (slides publish both together)
                self._lat_base_dev = jnp.asarray(
                    [s._lat_base for s in self.sessions], jnp.int32)
            # versions may have been bumped by ensure() just above
            self._lat_key = (cells,
                             tuple(s._lattice.version for s in self.sessions))

        if key != self._cache_key or self._dev is None:
            from ..synth.score import stack_scores

            # Incremental update: when only a few sessions' scores changed
            # (a feed, a rebase, an idle-horizon append) and the batch
            # structure (E bucket, voices, backend) is stable, upload just
            # the changed rows (~13 KB/session) and scatter them into the
            # device-resident stack — a full [N, E] re-upload is ~1.7 MB
            # per publish and saturates a remote device link at serving
            # feed rates (measured, docs/SERVING.md).
            prev_key = self._cache_key
            # NOTE: the voice-id tuple (key[2]) is deliberately NOT part of
            # same_struct: live [pitch:]/[voice:] commands replace a Voice
            # object (new id) but bump that session's _rev, so the changed
            # set below catches them and the scatter carries the new score
            # rows + jitter deltas. A DIRECT session.voice assignment (no
            # _rev bump) changes key[2] with an empty changed set and falls
            # through to the full rebuild.
            same_struct = (
                self._dev is not None and prev_key is not None
                and prev_key[0] == key[0]
                and self._dev["backend"] == self.backend)
            changed = ([i for i in range(self.n)
                        if prev_key[1][i] != key[1][i]]
                       if same_struct else None)
            # K capped at 8: the scatter jit compiles one shape per K
            # bucket {1,2,4,8} (all AOT-warmed by serve_start); a larger
            # changed set takes the full-upload path below
            if changed is not None and 0 < len(changed) <= min(8, self.n):
                from ..synth.kernel_fused import fused_supported

                rows = [self.sessions[i]._build_score(E) for i in changed]
                rows_b = stack_scores(rows)
                if (not self.backend.startswith("fused")
                        or fused_supported(rows_b, self.sample_rate,
                                           jitter_inc=inc)):
                    K = _scatter_bucket(len(changed))   # jit-shape bucketing
                    pad = K - len(changed)
                    idx = np.asarray(changed + changed[:1] * pad, np.int32)
                    if pad:                       # idempotent duplicate row
                        rows_b = jax.tree.map(
                            lambda f: np.concatenate(
                                [f] + [f[:1]] * pad, axis=0), rows_b)
                    off_new = np.asarray(
                        [self.sessions[i]._consumed_samples
                         for i in idx], np.int32)
                    # jnp, not raw np: a host numpy arg makes jax.jit
                    # compile a second entry for the same aval (measured),
                    # defeating the serve_start K-bucket warm
                    jd_new = tuple(
                        jnp.asarray([getattr(self.sessions[i].voice, a)
                                     for i in idx], jnp.float32)
                        for a in ("jitter_delta_frequency",
                                  "jitter_delta_formant_frequency",
                                  "jitter_delta_amplitude"))
                    d = self._dev
                    scores2, off2, jd2 = _scatter_rows(
                        d["scores"], d["offsets"],
                        d["jparams"][1:], jax.device_put(rows_b),
                        jnp.asarray(off_new), jd_new, jnp.asarray(idx))
                    self._dev = dict(scores=scores2,
                                     jparams=(d["jparams"][0],) + jd2,
                                     offsets=off2,
                                     backend=d["backend"])
                    self._cache_key = key
                    self._dev["lattices"] = self._lat_dev
                    self._dev["lat_base"] = self._lat_base_dev
                    return self._dev

            scores = [s._build_score(E) for s in self.sessions]
            scores_b = stack_scores(scores)
            # sessions may have switched voices live: per-session jitter
            # deltas (jitter RATE must stay shared — it fixes the lattice
            # schedule)
            for s in self.sessions:
                assert abs(s.voice.jitter_frequency - inc) < 1e-9, \
                    "pooled sessions must share a jitter rate"
            jparams = (jnp.float32(inc),
                       jnp.asarray([s.voice.jitter_delta_frequency
                                    for s in self.sessions], jnp.float32),
                       jnp.asarray([s.voice.jitter_delta_formant_frequency
                                    for s in self.sessions], jnp.float32),
                       jnp.asarray([s.voice.jitter_delta_amplitude
                                    for s in self.sessions], jnp.float32))
            offsets = jnp.asarray([s._consumed_samples
                                   for s in self.sessions], jnp.int32)

            backend = self.backend
            if backend.startswith("fused"):
                from ..synth.kernel_fused import fused_supported

                if not fused_supported(scores_b, self.sample_rate,
                                       jitter_inc=inc):
                    backend = "xla"   # pathological tick: per-chunk row
                    #                   selection precondition violated.
                    #                   NOTE: a mesh-sharded pool serves
                    #                   such a tick unsharded (correctness
                    #                   preserved; jit reshards the state
                    #                   pytree) — text frontends never
                    #                   produce sub-chunk elements, so this
                    #                   is a non-path in practice
            self._dev = dict(scores=jax.device_put(scores_b),
                             jparams=jparams, offsets=offsets,
                             backend=backend)
            self._cache_key = key
        self._dev["lattices"] = self._lat_dev
        self._dev["lat_base"] = self._lat_base_dev
        return self._dev

    def read_block(self, sync: bool = True) -> np.ndarray:
        """Advance every session by one block: returns [N, block] audio.

        sync=False returns the device array without fetching — callers can
        pipeline many ticks and fetch audio in bulk (on axon every
        device->host fetch costs a ~30 ms round trip)."""
        return self.read_blocks(1, sync=sync)

    def read_blocks(self, k: int = 1, sync: bool = True) -> np.ndarray:
        """Advance every session by k blocks in ONE device dispatch:
        returns [N, k*block] audio.

        Read-ahead serving: when sessions have text buffered ahead, a k>1
        read trades k*block of lookahead latency for amortizing the
        per-dispatch cost (host prep + launch) across k blocks — the
        aggregate-throughput knob. k=1 is the latency-bounded live tick.
        State continuity across calls is the same f32 phase handoff either
        way, so mixing k values is safe."""
        blk = self.block * int(k)
        dev = self._prepare_tick(blk)
        backend = dev["backend"]
        srj = self._srj
        pcm_in_tick = False
        if backend.startswith("fused"):
            pcm_in_tick = self.output != "f32"
            tick = self._tick_program(blk, backend)
            out, states, off2, jstate2 = tick(
                dev["scores"], dev["lattices"], dev["jparams"], srj,
                dev["offsets"], self._jstates, dev["lat_base"], self._states)
            dev["offsets"] = off2
        else:
            out, states, jstate2 = _stream_block_batch(
                dev["scores"], dev["lattices"], dev["jparams"], srj,
                dev["offsets"], self._jstates, dev["lat_base"],
                self._states, blk, use_pallas=False)
            dev["offsets"] = dev["offsets"] + blk

        self._states = states
        self._jstates = jstate2
        # all sessions advance in lockstep: ONE pool-level lag integer; the
        # StreamSession counter properties fold it into every read (state
        # slices are materialized lazily via s._materialize_state)
        self._lag_samples += blk
        if self.output != "f32":
            if not pcm_in_tick:
                out = _pcm16(out) if self.output == "pcm16" else _ulaw(out)
            return np.asarray(out) if sync else out
        return np.asarray(out, np.float32) if sync else out

    # -- depth-2 pipelined serving ----------------------------------------

    def collect(self):
        """Fetch the in-flight tick's audio [N, block] (None if nothing is
        in flight). With the depth-2 schedule the device->host copy was
        started a full block-period ago (dispatch_tick), so by the sink's
        deadline the data is normally already host-resident and this
        returns in microseconds — the tick's transfer latency hides inside
        the previous period instead of being paid at the deadline."""
        prev, self._inflight = self._inflight, None
        if prev is None:
            return None
        return (np.asarray(prev) if self.output != "f32"
                else np.asarray(prev, np.float32))

    def dispatch_tick(self) -> None:
        """Dispatch the next tick's device program and start its audio's
        device->host copy asynchronously; collect() returns it. At most
        one tick is in flight (bounded queue depth 2): dispatching with a
        tick still uncollected collects and discards it first."""
        if self._inflight is not None:
            self.collect()
        out = self.read_block(sync=False)
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass   # backend without async D2H: np.asarray still works
        self._inflight = out

    def tick_pipelined(self):
        """One serving tick with a depth-2 pipeline: collects the PREVIOUS
        tick's audio [N, block] (fetch first — its async copy has had a
        whole period to drain), then dispatches this tick's program.
        Bounded queue depth 2, exactly one extra block of sink latency vs
        a synchronous tick; no read-ahead (each tick's text can still be
        fed right up to its dispatch).

        Returns None on the first call (nothing in flight yet); call
        drain() at end-of-stream for the final block. This is the serving
        loop for strict per-block deadlines (the reference's audio-callback
        pull contract, examples/interactive.rs:41-70) on hardware where a
        synchronous dispatch+fetch exceeds the block budget.
        """
        audio = self.collect()
        self.dispatch_tick()
        return audio

    def drain(self):
        """Fetch the last in-flight pipelined tick (None if none)."""
        return self.collect()

    # -- RT serving: async frontend + dispatch-only ticks ------------------
    #
    # Strict per-block deadlines require the real-time thread to do
    # NOTHING but dispatch. Every host cost that can stall a tick —
    # horizon maintenance, rebases, score rebuilds, host->device uploads,
    # even a jit recompile — moves to a FRONTEND thread that publishes
    # complete device-input sets; serve_tick() atomically adopts the
    # latest published set and dispatches. Text fed at tick k becomes
    # audible one frontend cycle later (~one block period) — the latency
    # contract interactive TTS needs — and the audio stream itself never
    # underruns on frontend work. This is the production split the
    # reference's cpal callback implies (examples/interactive.rs:41-70):
    # the audio callback pulls; the synthesis frontend runs elsewhere.

    def _tick_program(self, blk: int, backend: str):
        """The fused tick dispatcher for `blk` samples on this pool's
        device layout: the mesh-sharded shard_map program when the pool is
        sharded (cached per block size), else the single-device
        _stream_tick_fused jit. Output conversion (pcm16/µ-law) and the
        lattice-window truncation are folded into either program — one
        device execution per tick. Same callable for read_blocks,
        serve_tick, and _serve_warm, so the warmed program IS the
        dispatched program."""
        from ..synth.kernel_fused import _n_lat_rows

        lat_win = _n_lat_rows(blk) + _n_lat_rows(128) + 2
        if self.mesh is not None:
            tick = self._sharded_ticks.get(blk)
            if tick is None:
                from ..parallel.sharded import sharded_stream_tick_fn

                tick = sharded_stream_tick_fn(
                    self.mesh, blk, backend == "fused_interpret",
                    out_fmt=self.output, lat_window=lat_win)
                self._sharded_ticks[blk] = tick
            return tick
        return functools.partial(
            _stream_tick_fused, block=blk,
            interpret=backend == "fused_interpret",
            out_fmt=self.output, lat_window=lat_win)

    def _serve_warm(self, swap):
        """Compile-warm the tick program for `swap`'s backend by EXECUTING
        it once on the published inputs (outputs discarded — the functions
        are pure, no donation, so device state does not advance).
        Execution, not .lower().compile(): an AOT-compiled executable is
        dropped on the floor and never enters jax.jit's call cache, so the
        first live dispatch would compile AGAIN (at best a persistent-cache
        disk hit, still a multi-100-ms stall on the RT thread).

        Called from serve_start and — for a mid-serving backend OR jit
        SHAPE change (the fused_supported pathological-score downgrade, an
        E-bucket growth past pin_elems, a lattice cell-count change) —
        from the frontend thread before the swap publishes, so the RT
        thread never dispatches an uncompiled program."""
        backend = swap["backend"]
        # keyed on (backend, input shapes): a new score/lattice shape is a
        # new compile even with the backend unchanged
        key = (backend, tuple(
            (tuple(leaf.shape), str(leaf.dtype)) for leaf in
            jax.tree.leaves((swap["scores"], swap["lattices"]))))
        if key in getattr(self, "_serve_warmed", set()):
            return
        off = jnp.asarray(swap["off_host"])
        if backend.startswith("fused"):
            self._tick_program(self.block, backend)(
                swap["scores"], swap["lattices"], swap["jparams"],
                self._srj, off, self._jstates, swap["lat_base"],
                self._states)
        else:                               # xla fallback tick + output jit
            out, _, _ = _stream_block_batch(
                swap["scores"], swap["lattices"], swap["jparams"],
                self._srj, off, self._jstates, swap["lat_base"],
                self._states, self.block, use_pallas=False)
            if self.output == "pcm16":
                _pcm16(out)
            elif self.output == "ulaw":
                _ulaw(out)
        self._serve_warmed.add(key)

    def _serve_build(self):
        """Frontend cycle: sync counters to the RT tick clock, run session
        maintenance, rebuild + upload changed inputs, publish a swap.

        Runs ONLY on the frontend thread (and once in serve_start)."""
        t_snap = self._serve_ticks          # GIL-atomic int read
        blk = self.block
        with self._serve_lock:
            adv = (t_snap - self._serve_synced) * blk
            if adv:
                for s in self.sessions:
                    s._consumed_samples += adv
                    s._jitter_pos += adv
                self._serve_synced = t_snap
            dev = self._prepare_tick(blk)
            pub_key = (self._cache_key, self._lat_key)
            if pub_key == self._serve_pub_key:
                return False                # steady state: nothing changed
            swap = dict(
                scores=dev["scores"], lattices=dev["lattices"],
                lat_base=dev["lat_base"],
                jparams=dev["jparams"], backend=dev["backend"],
                off_host=np.asarray(
                    [s._consumed_samples for s in self.sessions], np.int32),
                snap_ticks=t_snap,
            )
        # a backend or input-shape change must compile on THIS thread
        # before the swap becomes adoptable, not on the RT thread. The
        # publish key commits only AFTER the warm succeeds: a transient
        # warm failure (tunnel error, OOM) leaves pub_key unchanged so the
        # next frontend cycle retries this publish instead of treating it
        # as steady state and never serving the pending feeds. pub_key is
        # only ever touched by the frontend thread (and serve_start before
        # the thread exists), so writing it outside _serve_lock is safe.
        self._serve_warm(swap)
        self._serve_pub_key = pub_key
        with self._swap_lock:
            self._swap_pending = swap       # newest publish wins
        return True

    def serve_start(self, period: Optional[float] = None) -> None:
        """Start the serving frontend; serve_tick() becomes RT-safe.

        `period` is the frontend cycle time (default: one block period).
        The first build + the tick program's compile happen HERE, so the
        first serve_tick() already runs warm. Feeds remain allowed from
        any thread (they take the frontend lock, never the RT path)."""
        import threading

        if getattr(self, "_serve_thread", None) is not None:
            return
        self._serve_lock = threading.Lock()
        self._swap_lock = threading.Lock()
        self._swap_pending = None
        self._serve_pub_key = None
        self._serve_ticks = 0
        self._serve_synced = 0
        self._serve_stop_flag = False
        self._serve_warmed = set()          # backends with a compiled tick
        self._serving = True                # gates _feed_lock from HERE on:
        #                                     feeds must serialize against
        #                                     the initial build/warm-up too
        self._serve_build()                 # initial publish (forced below)
        with self._swap_lock:
            swap = self._swap_pending
        assert swap is not None, "initial serve build must publish"
        # the tick program itself was warmed by _serve_build's publish path
        off = jnp.asarray(swap["off_host"])
        # warm every incremental-scatter K bucket the live path can
        # execute — _prepare_tick allows len(changed) <= min(8, n) and
        # buckets it to the next power of two, so K=8 is reachable from
        # n=5 upward (pad rows). A mid-serving compile RPC stalls even
        # the RT thread (the device client serializes compile and execute
        # requests — measured 1.9 s dispatch stall, docs/SERVING.md).
        # idx=0 rewrites row 0 with itself; results are discarded.
        for K in (1, 2, 4, 8):
            if (K >> 1) >= min(8, self.n):
                break
            rows = jax.tree.map(
                lambda f: jnp.repeat(f[:1], K, axis=0), swap["scores"])
            idxK = jnp.zeros((K,), jnp.int32)
            jdK = tuple(jnp.repeat(x[:1], K, axis=0)
                        for x in swap["jparams"][1:])
            _scatter_rows(swap["scores"], off, swap["jparams"][1:],
                          rows, idxK, jdK, idxK)
            lrows = jax.tree.map(
                lambda f: jnp.repeat(f[:1], K, axis=0), swap["lattices"])
            _scatter_lat_rows((swap["lattices"], swap["lat_base"]),
                              (lrows, jnp.zeros((K,), jnp.int32)), idxK)
        period = float(period) if period else self.block / self.sample_rate
        self._serve_period = period

        def loop():
            import time as _t

            while not self._serve_stop_flag:
                t0 = _t.perf_counter()
                try:
                    self._serve_build()
                except Exception:           # pragma: no cover - keep serving
                    import traceback

                    traceback.print_exc()
                deadline = t0 + self._serve_period
                while not self._serve_stop_flag:
                    dt = deadline - _t.perf_counter()
                    if dt <= 0:
                        break
                    _t.sleep(min(dt, 0.05))

        self._serve_thread = threading.Thread(target=loop, daemon=True)
        self._serve_thread.start()

    def serve_tick(self):
        """RT dispatch: adopt the latest published inputs (if any) and run
        one tick. Returns the DEVICE audio array [N, block] (int16 when
        output='pcm16') with its device->host copy already started — the
        caller's sink fetches it (np.asarray) against its own deadline.

        Touches no locks the frontend can hold for long: adoption is a
        pointer swap + two [N] int32 uploads."""
        with self._swap_lock:
            swap, self._swap_pending = self._swap_pending, None
        if swap is not None:
            delta = np.int32((self._serve_ticks - swap["snap_ticks"])
                             * self.block)
            self._serve_dev = dict(
                scores=swap["scores"], lattices=swap["lattices"],
                lat_base=swap["lat_base"],
                jparams=swap["jparams"], backend=swap["backend"],
                offsets=jnp.asarray(swap["off_host"] + delta))
        dev = self._serve_dev
        # the carried jitter state (self._jstates) never rides a swap: it
        # advances only here (the RT thread is its single mutator while
        # serving), and slides publish a new lat_base WITH the new window
        # rows, so absolute cells stay consistent across adoptions
        if dev["backend"].startswith("fused"):
            out, states, off2, jstate2 = self._tick_program(
                self.block, dev["backend"])(
                dev["scores"], dev["lattices"], dev["jparams"], self._srj,
                dev["offsets"], self._jstates, dev["lat_base"], self._states)
            dev["offsets"] = off2
        else:                               # pathological-score fallback
            out, states, jstate2 = _stream_block_batch(
                dev["scores"], dev["lattices"], dev["jparams"], self._srj,
                dev["offsets"], self._jstates, dev["lat_base"],
                self._states, self.block, use_pallas=False)
            dev["offsets"] = dev["offsets"] + self.block
            if self.output == "pcm16":
                out = _pcm16(out)
            elif self.output == "ulaw":
                out = _ulaw(out)
        self._states = states
        self._jstates = jstate2
        self._serve_ticks += 1
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return out

    def serve_stop(self) -> None:
        """Stop the frontend thread and resync session counters so the
        non-serving APIs (read_block, save) see the served position."""
        th = getattr(self, "_serve_thread", None)
        if th is None:
            return
        self._serve_stop_flag = True
        th.join(timeout=30)
        if th.is_alive():
            # a frontend cycle can stall minutes inside _serve_build (a
            # mid-serving recompile, a dead device tunnel); tearing down
            # serve state under a live thread would let it mutate counters
            # and _dev concurrently with non-serving APIs — and a new
            # serve_start would spawn a second loop beside the zombie
            raise RuntimeError(
                "serving frontend thread did not stop within 30 s (stalled "
                "build?); serve state left intact — retry serve_stop()")
        self._serve_thread = None
        self._serving = False
        blk = self.block
        with self._serve_lock:
            adv = (self._serve_ticks - self._serve_synced) * blk
            if adv:
                for s in self.sessions:
                    s._consumed_samples += adv
                    s._jitter_pos += adv
                self._serve_synced = self._serve_ticks
        # the RT dev dict carried device-advanced offsets; drop the pool's
        # upload cache (and the quiet fast path, which would otherwise
        # return the stale _dev) so the next read_block rebuilds from host
        # counters
        self._cache_key = None
        self._lat_key = None
        self._serve_dev = None
        self._quiet = None

    # -- pool-level checkpoint / restore -----------------------------------
    #
    # The serving-ops story (migration / restart): ONE payload captures all
    # N sessions — rolling scores, counters, lattice continuations — plus
    # the stacked device DSP state, fetched in a single device->host
    # transfer (per-session save_state would pay 5*N tiny device slices).

    def save(self) -> bytes:
        import io

        if getattr(self, "_serving", False):
            # session counters sync only at frontend cycles while the RT
            # thread concurrently replaces _states each tick — a checkpoint
            # taken mid-serve would pair stale counters with newer DSP
            # state and resume desynchronized. serve_stop() resyncs.
            raise RuntimeError(
                "StreamPool.save() while serve mode is live would snapshot "
                "a torn state; call serve_stop() first")
        if getattr(self, "_inflight", None) is not None:
            self.drain()   # a checkpoint must not orphan an in-flight tick
        host = SynthState(*(np.asarray(x) for x in self._states))
        parts = {"pool_meta": np.array([self.n, self.block], np.int64)}
        for i, s in enumerate(self.sessions):
            st = SynthState(*(f[i] for f in host))
            for k, v in s._payload_dict(st).items():
                parts[f"s{i}_{k}"] = v
        buf = io.BytesIO()
        np.savez(buf, **parts)
        return buf.getvalue()

    def load(self, payload: bytes) -> None:
        import io

        if getattr(self, "_serving", False):
            # mirror of the save() guard: the RT thread would overwrite the
            # restored _states on its next tick while _serve_dev kept
            # dispatching the pre-load scores/offsets — a silently torn
            # restore. serve_stop() first, load, then serve_start again.
            raise RuntimeError(
                "StreamPool.load() while serve mode is live would be "
                "clobbered by the RT thread; call serve_stop() first")
        z = np.load(io.BytesIO(payload))
        n, block = (int(x) for x in z["pool_meta"])
        if n != self.n:
            raise ValueError(f"payload has {n} sessions, pool has {self.n}")
        if block != self.block:
            raise ValueError(f"payload block={block}, pool block={self.block}")
        for i, s in enumerate(self.sessions):
            s._apply_payload(z, prefix=f"s{i}_")
        # one stacked upload replaces the whole device state
        self._states = SynthState(*(
            jnp.stack([jnp.asarray(f) for f in fields])
            for fields in zip(*(s._state for s in self.sessions))))
        # carried jitter states rebuild from the restored counters (the
        # exact schedule is deterministic in absolute position)
        js = [s._jitter_state_host() for s in self.sessions]
        self._jstates = (
            jnp.asarray([p for p, _ in js], jnp.float32),
            jnp.asarray([c for _, c in js], jnp.int32))
        self._cache_key = None
        self._lat_key = None
        self._inflight = None
        self._quiet = None


__all__ = ["StreamSession", "StreamPool"]
