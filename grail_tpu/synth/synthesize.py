"""The formant-synthesis DSP core (reference hot loop, src/lib.rs:467-600).

Per sample: polyBLEP anti-aliased saw carrier -> white-noise breath blend ->
one-pole lowpass ("glottal" smoothing) -> turbulence noise-multiply ->
amplitude -> bank of 8 SVF bandpass resonators (cytomic
SvfLinearTrapOptimised2) -> sum * 0.5.

Two implementations with identical semantics:

  * `synthesize_scan`  — lax.scan, one sample per step, exact reference
    operation order. Correctness baseline; slow on TPU (latency-bound).

  * `synthesize_block` — the TPU-native path. Every sequential dependency is
    either closed-form or a *linear recurrence with time-varying
    coefficients*, so the whole utterance is computed in parallel:
      - carrier phase:      prefix-sum of frequency, mod 1
      - Lehmer noise:       closed-form skip-ahead (core.rng)
      - 1-pole lowpass:     affine associative scan  s' = a*s + b
      - SVF resonator bank: 2x2 affine associative scan S' = M S + w
    Both filters are strictly stable (contractions), so f32 scan
    reassociation error stays bounded — validated against the oracle at
    < -60 dB. Carried state in/out makes the block form streamable and is
    the basis for sequence-parallel sharding across chips.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.approx import exp_approx, tan_approx
from ..core.constants import LEHMER_A, NUM_FORMANTS
from ..core.rng import random_f32_from_state
from .elem import SynthesisElem


class SynthState(NamedTuple):
    """Carried DSP state (reference Synthesize fields, src/lib.rs:470-488)."""

    phase: jnp.ndarray          # [] or [B]
    filter_state_a: jnp.ndarray  # [..., 8] one-pole lowpass
    filter_state_b: jnp.ndarray  # [..., 8] SVF ic1eq
    filter_state_c: jnp.ndarray  # [..., 8] SVF ic2eq
    seed: jnp.ndarray           # [] or [B] uint32 noise state

    @staticmethod
    def init(batch_shape=()) -> "SynthState":
        """Reference IntoSynthesize::synthesize init (src/lib.rs:587-596)."""
        return SynthState(
            phase=jnp.zeros(batch_shape, jnp.float32),
            filter_state_a=jnp.zeros(batch_shape + (NUM_FORMANTS,), jnp.float32),
            filter_state_b=jnp.zeros(batch_shape + (NUM_FORMANTS,), jnp.float32),
            filter_state_c=jnp.zeros(batch_shape + (NUM_FORMANTS,), jnp.float32),
            seed=jnp.zeros(batch_shape, jnp.uint32),
        )


def _polyblep(phase, f):
    """Anti-aliasing offset for the saw discontinuity (src/lib.rs:503-514)."""
    t0 = phase / f
    first = 2.0 * t0 - t0 * t0 - 1.0
    t1 = (phase - 1.0) / f
    last = t1 * t1 + 2.0 * t1 + 1.0
    return jnp.where(phase < f, first, jnp.where(phase > 1.0 - f, last, 0.0))


def _svf_coeffs(elem: SynthesisElem):
    g = tan_approx(elem.formant_freq)
    k = elem.formant_bw / elem.formant_freq
    a1 = 1.0 / (1.0 + g * (g + k))
    a2 = g * a1
    a3 = g * a2
    return a1, a2, a3


def _sample_v0(elem: SynthesisElem, saw, noise, state_a):
    """Shared per-sample front half: breath blend, lowpass input, turbulence,
    amplitude. Returns (v0, new_state_a)."""
    noise_wave = saw * (1.0 - elem.formant_breath) + noise * elem.formant_breath
    alpha = exp_approx(elem.formant_smooth)
    new_a = state_a + (1.0 - alpha) * (noise_wave - state_a)
    turb = (1.0 - elem.formant_turb) + noise * elem.formant_turb
    v0 = (new_a * turb) * elem.formant_amp
    return v0, new_a


# ---------------------------------------------------------------------------
# Sequential reference path (lax.scan)
# ---------------------------------------------------------------------------

def synthesize_scan(elems: SynthesisElem,
                    state: Optional[SynthState] = None,
                    carrier=None) -> Tuple[jnp.ndarray, SynthState]:
    """One lax.scan step per sample, reference op order. elems: [T, ...].

    `carrier` (optional [T, ...]): the reference's exact f32 per-sample
    carrier phase (native pre-pass); replaces the carried phase recurrence
    (the returned state's phase is then the last track value, post-update
    under the reference rule)."""
    if state is None:
        state = SynthState.init(elems.batch_shape[1:])

    def step(st: SynthState, xs):
        elem, car = xs
        f = elem.frequency
        ph = st.phase if car is None else car
        pb = _polyblep(ph, f)
        saw = (2.0 * ph - 1.0 - pb)[..., None]

        phase = ph + f
        phase = jnp.where(phase >= 1.0, phase - 1.0, phase)

        seed = st.seed * jnp.uint32(LEHMER_A) + jnp.uint32(1)
        noise = random_f32_from_state(seed)[..., None]

        v0, state_a = _sample_v0(elem, saw, noise, st.filter_state_a)

        a1, a2, a3 = _svf_coeffs(elem)
        v3 = v0 - st.filter_state_c
        v1 = a1 * st.filter_state_b + a2 * v3
        v2 = st.filter_state_c + a2 * st.filter_state_b + a3 * v3
        state_b = 2.0 * v1 - st.filter_state_b
        state_c = 2.0 * v2 - st.filter_state_c

        out = jnp.sum(v1, axis=-1) * 0.5
        return SynthState(phase, state_a, state_b, state_c, seed), out

    state, out = jax.lax.scan(step, state, (elems, carrier))
    return out, state


# ---------------------------------------------------------------------------
# Parallel block path (associative scans)
# ---------------------------------------------------------------------------

def affine_scan_cum(a, b):
    """Cumulative transfer operators of s_k = a_k * s_{k-1} + b_k:
    returns (A_k, B_k) with s_k = A_k * s_0 + B_k. Associative composition
    (a2, b2) after (a1, b1) = (a2*a1, a2*b1 + b2), over axis 0 (time)."""
    def combine(x, y):
        ax, bx = x
        ay, by = y
        return ax * ay, ay * bx + by

    return jax.lax.associative_scan(combine, (a, b), axis=0)


def _affine_scan(a, b, s0):
    """Inclusive scan of s_k = a_k * s_{k-1} + b_k with initial state s0."""
    A, B = affine_scan_cum(a, b)
    return A * s0 + B


def svf_scan_cum(m11, m12, m21, m22, w1, w2):
    """Cumulative transfer operators of the 2-state recurrence
    S_k = M_k S_{k-1} + w_k: returns the 6-tuple (M_k^cum..., W_k^cum...)
    with S_k = M_k^cum S_0 + W_k^cum. Composition of (M, w) pairs:
    (My*Mx, My*wx + wy), explicit 2x2 component arithmetic on the VPU."""
    def combine(x, y):
        x11, x12, x21, x22, xw1, xw2 = x
        y11, y12, y21, y22, yw1, yw2 = y
        z11 = y11 * x11 + y12 * x21
        z12 = y11 * x12 + y12 * x22
        z21 = y21 * x11 + y22 * x21
        z22 = y21 * x12 + y22 * x22
        zw1 = y11 * xw1 + y12 * xw2 + yw1
        zw2 = y21 * xw1 + y22 * xw2 + yw2
        return z11, z12, z21, z22, zw1, zw2

    return jax.lax.associative_scan(combine, (m11, m12, m21, m22, w1, w2), axis=0)


def _svf_scan(m11, m12, m21, m22, w1, w2, b0, c0):
    """Inclusive SVF scan with initial state (b0, c0); returns post-update
    states (b_k, c_k)."""
    c11, c12, c21, c22, cw1, cw2 = svf_scan_cum(m11, m12, m21, m22, w1, w2)
    return c11 * b0 + c12 * c0 + cw1, c21 * b0 + c22 * c0 + cw2


def carrier_scan(phase0, freq):
    """The reference carrier recurrence, carried on device: per sample
    `phase += f` (f32 round), `if phase >= 1.0: phase -= 1.0` (exact;
    src/lib.rs:520-525). The polyBLEP consumes the PRE-update phase, so the
    emitted track at step k is the state before adding freq[k]. IEEE f32
    adds from identical state make this bit-identical to the fused kernel's
    in-kernel recurrence and the native host track (on the same frequency
    stream) — the XLA paths' exact carrier. Sequential (lax.scan over T):
    cheap on CPU, latency-bound on TPU — the fused kernel's in-kernel
    variant is the TPU production form. freq: [T, ...] (any trailing batch
    dims). Returns (track [T, ...], final phase)."""
    one = jnp.float32(1.0)

    def step(p, f):
        pre = p
        p = p + f
        p = jnp.where(p >= one, p - one, p)
        return p, pre

    pf, track = jax.lax.scan(step, jnp.asarray(phase0, jnp.float32), freq)
    return track, pf


def carrier_phase(frequency, phase0):
    """Closed-form polyBLEP phase track: exclusive prefix-sum of f, mod 1.

    The reference wraps with a single conditional subtract (src/lib.rs:520-525)
    which equals mod-1 of the running sum (f <= ~0.5 per step). A float32
    running sum would lose phase precision over long utterances (the sum
    grows unbounded while f32 precision decays), so we accumulate in Q32
    *fixed point*: uint32 wraparound IS mod-1, exactly, at any length. The
    quantization bias is f's rounding to 2^-32, i.e. sub-microhertz carrier
    error — far below the reference's own f32 accumulation drift.

    Boundary note: `phase_out` is returned as f32 (SynthState.phase), so
    CHAINED blocks round the accumulator to 2^-25 once per boundary —
    ~3e-8 cycle/block, ~1e-4 cycle over thousands of blocks. Inaudible and
    shared by the streaming tick; paths that need the exact accumulator
    across boundaries thread the raw Q32 word instead (the fused split
    path's phase_q32, kernel_fused.synth_fused_pallas)."""
    scale = jnp.float32(4294967296.0)  # 2^32
    fq = (frequency * scale).astype(jnp.uint32)
    csum = jnp.cumsum(fq, axis=0)  # uint32 wraparound = mod 1
    p0q = (jnp.mod(phase0, 1.0) * scale).astype(jnp.uint32)
    excl = jnp.concatenate([jnp.zeros_like(csum[:1]), csum[:-1]], axis=0)
    inv = jnp.float32(1.0 / 4294967296.0)
    phase = (p0q + excl).astype(jnp.float32) * inv
    phase_out = (p0q + csum[-1]).astype(jnp.float32) * inv
    return phase, phase_out


def block_noise(seed0, T: int):
    """[T] (or [T, B]) Lehmer noise continuing from state `seed0`."""
    from ..core.rng import lehmer_affine

    powA, S = lehmer_affine(T)
    powA_d = jnp.asarray(powA[1:], dtype=jnp.uint32)
    S_d = jnp.asarray(S[1:], dtype=jnp.uint32)
    seed0 = jnp.asarray(seed0, jnp.uint32)
    states = powA_d.reshape((T,) + (1,) * seed0.ndim) * seed0 + \
        S_d.reshape((T,) + (1,) * seed0.ndim)
    return random_f32_from_state(states), states[-1]


def synthesize_block(elems: SynthesisElem,
                     state: Optional[SynthState] = None,
                     block_size: int = 4096) -> Tuple[jnp.ndarray, SynthState]:
    """Blocked parallel synthesis. elems: [T, ...]; returns ([T, ...], state).

    Two-level scan structure: a sequential lax.scan over blocks carries the
    tiny DSP state; within each block everything is parallel (closed-form
    phase/noise + associative-scan filters). This bounds compile size, keeps
    VMEM-friendly working sets, and is the same decomposition the Pallas
    kernel and the streaming session use. T must be a multiple of block_size
    (or <= block_size). Works for unbatched [T] or batched [T, B] streams
    (time leading).
    """
    T = elems.frequency.shape[0]
    bshape = elems.frequency.shape[1:]
    if state is None:
        state = SynthState.init(bshape)
    if T > block_size:
        if T % block_size:
            raise ValueError(f"T={T} not a multiple of block_size={block_size}")
        nb = T // block_size
        eb = SynthesisElem(*(f.reshape((nb, block_size) + f.shape[1:]) for f in elems))

        def step(st, e):
            out, st2 = _block_core(e, st)
            return st2, out

        state, outs = jax.lax.scan(step, state, eb)
        return outs.reshape((T,) + outs.shape[2:]), state
    return _block_core(elems, state)


def _block_core(elems: SynthesisElem, state: SynthState,
                carrier=None) -> Tuple[jnp.ndarray, SynthState]:
    """One fully-parallel block (see synthesize_block).

    `carrier` (optional [T, ...]): exact f32 carrier phase per sample
    (native pre-pass) in place of the Q32 accumulator; the carried
    state's phase is then passed through unchanged (exact-carrier callers
    never read it)."""
    T = elems.frequency.shape[0]

    f = elems.frequency
    if carrier is None:
        phase, phase_out = carrier_phase(f, state.phase)
    else:
        phase, phase_out = carrier, state.phase
    pb = _polyblep(phase, f)
    saw = (2.0 * phase - 1.0 - pb)[..., None]

    noise, seed_out = block_noise(state.seed, T)
    noise = noise[..., None]

    # one-pole lowpass: s' = alpha*s + (1-alpha)*x  (affine scan)
    noise_wave = saw * (1.0 - elems.formant_breath) + noise * elems.formant_breath
    alpha = exp_approx(elems.formant_smooth)
    state_a = _affine_scan(alpha, (1.0 - alpha) * noise_wave, state.filter_state_a)

    turb = (1.0 - elems.formant_turb) + noise * elems.formant_turb
    v0 = (state_a * turb) * elems.formant_amp

    # SVF bank: S_k = M_k S_{k-1} + u_k * v0_k with
    #   M = [[2a1-1, -2a2], [2a2, 1-2a3]],  u = [2a2, 2a3]
    # output needs the PRE-update state: v1_k = a1*b_{k-1} + a2*(v0_k - c_{k-1})
    a1, a2, a3 = _svf_coeffs(elems)
    m11 = 2.0 * a1 - 1.0
    m12 = -2.0 * a2
    m21 = 2.0 * a2
    m22 = 1.0 - 2.0 * a3
    b_post, c_post = _svf_scan(m11, m12, m21, m22,
                               m21 * v0, 2.0 * a3 * v0,
                               state.filter_state_b, state.filter_state_c)

    b_pre = jnp.concatenate([state.filter_state_b[None], b_post[:-1]], axis=0)
    c_pre = jnp.concatenate([state.filter_state_c[None], c_post[:-1]], axis=0)
    v1 = a1 * b_pre + a2 * (v0 - c_pre)
    out = jnp.sum(v1, axis=-1) * 0.5

    new_state = SynthState(
        phase=phase_out,
        filter_state_a=state_a[-1],
        filter_state_b=b_post[-1],
        filter_state_c=c_post[-1],
        seed=seed_out,
    )
    return out, new_state


__all__ = [
    "SynthState", "synthesize_scan", "synthesize_block",
    "carrier_phase", "carrier_scan", "block_noise",
]
