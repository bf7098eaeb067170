"""Pallas TPU kernel for the formant-synthesis DSP core.

The reference hot loop (/root/reference/src/lib.rs:497-578) is ~60 8-wide
f32 ops per sample with four tiny recurrences (carrier phase, Lehmer RNG,
one-pole lowpass, 2-state SVF bank). The TPU decomposition:

  * Everything *feed-forward* — carrier phase (closed-form Q32 prefix sum),
    Lehmer noise (closed-form skip-ahead), polyBLEP saw, breath blend,
    filter coefficients (tan/exp approximations, the only divisions) — is
    computed VECTORIZED on the XLA side (`precompute_streams`) as seven
    [T, 8, B] coefficient streams (separate inputs — concatenating them
    would cost one full extra HBM pass).

  * Only the irreducibly *sequential* part runs in the kernel's inner loop:

        lp' = alpha . lp + d                   (one-pole lowpass)
        b'  = m11 . b - m21 . c + q1 . lp'     (SVF, v0 folded into q1/q2)
        c'  = m21 . b + m22 . c + q2 . lp'
        out = 0.25 * sum_formants(b' + b)      (v1 = (b'+b)/2)

    ~15 [8, 128] VPU ops per sample, zero divisions, zero transcendentals:
    lanes = batch (128 utterances/tile), sublanes = formants, time =
    sequential inner loop in exact recurrence order (numerically tighter
    than the associative-scan XLA fallback).

The kernel consumes the stream in VMEM-sized chunks double-buffered by the
Pallas pipeline, carries filter state in VMEM scratch across the sequential
time grid, and emits audio [T, B] plus final state (streaming/continuation).

Stream order: alpha, d, q1, q2, m11, m21, m22.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import NUM_FORMANTS
from ..core.approx import exp_approx
from .elem import SynthesisElem
from .synthesize import (SynthState, _polyblep, _svf_coeffs, block_noise,
                         carrier_phase)

LANE = 128          # batch tile (lane width)
CHUNK = 256         # time samples per grid step (VMEM block)


def precompute_streams(elems: SynthesisElem, state: SynthState):
    """XLA-side feed-forward prep: [T, B] elems -> seven [T, 8, B] coeff
    streams + advanced (phase, seed) state. All ops fuse into a few
    elementwise passes; the kernel never divides or evaluates polynomials.
    """
    T, B = elems.frequency.shape
    f = elems.frequency
    phase, phase_out = carrier_phase(f, state.phase)
    pb = _polyblep(phase, f)
    saw = (2.0 * phase - 1.0 - pb)[..., None]

    noise, seed_out = block_noise(state.seed, T)
    noise = noise[..., None]

    noise_wave = saw * (1.0 - elems.formant_breath) + noise * elems.formant_breath
    alpha = exp_approx(elems.formant_smooth)
    d = (1.0 - alpha) * noise_wave
    tamp = ((1.0 - elems.formant_turb) + noise * elems.formant_turb) * elems.formant_amp

    a1, a2, a3 = _svf_coeffs(elems)
    m11 = 2.0 * a1 - 1.0
    m21 = 2.0 * a2
    m22 = 1.0 - 2.0 * a3
    q1 = m21 * tamp
    q2 = (2.0 * a3) * tamp

    rows = [alpha, d, q1, q2, m11, m21, m22]
    # seven separate [T, 8, B] streams (NOT concatenated: a packed array
    # would cost one full extra HBM pass; the kernel takes seven inputs)
    streams = tuple(jnp.moveaxis(r, -1, 1).astype(jnp.float32) for r in rows)
    return streams, phase_out, seed_out


def _synth_kernel(alpha_ref, d_ref, q1_ref, q2_ref, m11_ref, m21_ref, m22_ref,
                  lp_in, b_in, c_in,
                  audio_ref, lp_out, b_out, c_out):
    # Filter state lives in the REVISITED OUTPUT blocks (index map constant
    # along the sequential time dimension) — the canonical Pallas
    # accumulator pattern. Carrying it in scratch across grid steps
    # miscompiled nondeterministically on this toolchain (state corrupted
    # under some compilations).
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _load_state():
        lp_out[...] = lp_in[...]
        b_out[...] = b_in[...]
        c_out[...] = c_in[...]

    def step(i, _):
        alpha = alpha_ref[i]
        d = d_ref[i]
        q1 = q1_ref[i]
        q2 = q2_ref[i]
        m11 = m11_ref[i]
        m21 = m21_ref[i]
        m22 = m22_ref[i]

        lp = alpha * lp_out[...] + d
        lp_out[...] = lp

        b = b_out[...]
        c = c_out[...]
        nb = m11 * b - m21 * c + q1 * lp
        nc = m21 * b + m22 * c + q2 * lp
        b_out[...] = nb
        c_out[...] = nc

        audio_ref[i, :] = jnp.sum(nb + b, axis=0) * 0.25
        return 0

    jax.lax.fori_loop(0, alpha_ref.shape[0], step, 0)


def kernel_geometry(B: int):
    """Pick (lane, chunk): wider lane tiles expose more independent
    recurrence streams per kernel instance (hides dependent-op latency —
    measured ~2x aggregate throughput at lane 256 vs two 128 tiles); chunk
    shrinks to keep the double-buffered [chunk, 56, lane] stream in VMEM."""
    lane = 256 if B % 256 == 0 else LANE
    return lane, (2 * CHUNK * LANE) // (2 * lane)


def synth_core_pallas(elems: SynthesisElem, state: SynthState,
                      interpret: bool = False) -> Tuple[jnp.ndarray, SynthState]:
    """Fused DSP core: XLA prep + kernel. Takes a [T, B]-batched
    SynthesisElem and returns (audio [T, B], new SynthState)."""
    streams, phase_out, seed_out = precompute_streams(elems, state)
    T, _, B = streams[0].shape
    lane, chunk = kernel_geometry(B)
    if interpret:  # interpreter mode has no lane-width constraint (CPU tests)
        lane = B
        chunk = min(chunk, T)
        if T % chunk != 0:   # odd short streams: run one grid step
            chunk = T
    assert T % chunk == 0, (T, chunk)
    assert B % lane == 0, (B, lane)
    nbt = B // lane
    nt = T // chunk

    lp = state.filter_state_a.T.reshape(NUM_FORMANTS, B)
    fb = state.filter_state_b.T.reshape(NUM_FORMANTS, B)
    fc = state.filter_state_c.T.reshape(NUM_FORMANTS, B)

    fvec = lambda: pl.BlockSpec((NUM_FORMANTS, lane), lambda bt, tt: (0, bt),
                                memory_space=pltpu.VMEM)
    stream_spec = lambda: pl.BlockSpec((chunk, NUM_FORMANTS, lane),
                                       lambda bt, tt: (tt, 0, bt),
                                       memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((T, B), jnp.float32),
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
    )
    # the time grid dimension MUST iterate sequentially (state carried in
    # scratch); declare it 'arbitrary' so Mosaic never reorders or
    # parallelizes it — without this the carry corrupts under some
    # compilations
    compiler_params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"))
    audio, lp_o, fb_o, fc_o = pl.pallas_call(
        _synth_kernel,
        grid=(nbt, nt),
        in_specs=[stream_spec() for _ in range(7)] + [fvec(), fvec(), fvec()],
        out_specs=(
            pl.BlockSpec((chunk, lane), lambda bt, tt: (tt, bt),
                         memory_space=pltpu.VMEM),
            fvec(), fvec(), fvec(),
        ),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*streams, lp, fb, fc)

    new_state = SynthState(
        phase=phase_out,
        filter_state_a=lp_o.T,
        filter_state_b=fb_o.T,
        filter_state_c=fc_o.T,
        seed=seed_out,
    )
    return audio, new_state


__all__ = ["synth_core_pallas", "precompute_streams", "LANE", "CHUNK"]
