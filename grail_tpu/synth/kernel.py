"""Pallas TPU kernel for the formant-synthesis DSP core.

The reference hot loop (/root/reference/src/lib.rs:497-578) is ~60 8-wide
f32 ops per sample with four tiny recurrences (carrier phase, Lehmer RNG,
one-pole lowpass, 2-state SVF bank). On TPU the winning decomposition is:

  lanes    = batch (128 utterances per tile)
  sublanes = formants (8)
  time     = sequential inner loop, exact reference operation order

so every per-sample op is ONE [8, 128] VPU op across 128 utterances. The
kernel consumes a packed parameter stream [T, 56, B] (7 fields x 8 formants,
produced by the XLA-side sequencer+jitter expansion) in VMEM-sized chunks
double-buffered by the Pallas pipeline, carries DSP state in VMEM scratch
across the sequential time grid, and emits audio [T, B] plus the final
state (for streaming and cross-call continuation).

Being sequential in time, this path reproduces the reference recurrences in
their original order — tighter numerically than the associative-scan XLA
fallback (synthesize.py), and ~flop-optimal: no log-factor scan passes, no
materialized intermediates.

Packed row layout (sublane index):
  0      : carrier frequency (broadcast row)
  1..8   : formant_freq   9..16 : formant_bw   17..24 : formant_smooth
  25..32 : formant_breath 33..40 : formant_turb 41..48 : formant_amp
  49..55 : padding (sublane alignment)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import LEHMER_A, NUM_FORMANTS
from .elem import SynthesisElem
from .synthesize import SynthState

PACK_ROWS = 56
LANE = 128          # batch tile (lane width)
CHUNK = 256         # time samples per grid step (VMEM block)


def _synth_kernel(params_ref, phase_in, seed_in, lp_in, b_in, c_in,
                  audio_ref, phase_out, seed_out, lp_out, b_out, c_out,
                  phase_scr, seed_scr, lp_scr, b_scr, c_scr):
    tt = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(tt == 0)
    def _load_state():
        phase_scr[...] = phase_in[...]
        seed_scr[...] = seed_in[...]
        lp_scr[...] = lp_in[...]
        b_scr[...] = b_in[...]
        c_scr[...] = c_in[...]

    def step(i, _):
        f = params_ref[i, 0:1, :]          # [1, B]
        ff = params_ref[i, 1:9, :]         # [8, B]
        bw = params_ref[i, 9:17, :]
        smooth = params_ref[i, 17:25, :]
        breath = params_ref[i, 25:33, :]
        turb = params_ref[i, 33:41, :]
        amp = params_ref[i, 41:49, :]

        phase = phase_scr[...]             # [1, B]
        # polyBLEP anti-aliased saw (src/lib.rs:503-517)
        t0 = phase / f
        first = 2.0 * t0 - t0 * t0 - 1.0
        t1 = (phase - 1.0) / f
        last = t1 * t1 + 2.0 * t1 + 1.0
        pb = jnp.where(phase < f, first, jnp.where(phase > 1.0 - f, last, 0.0))
        saw = 2.0 * phase - 1.0 - pb

        nphase = phase + f
        phase_scr[...] = jnp.where(nphase >= 1.0, nphase - 1.0, nphase)

        # Lehmer noise (src/lib.rs:36-55), one draw per sample
        seed = seed_scr[...] * jnp.uint32(LEHMER_A) + jnp.uint32(1)
        seed_scr[...] = seed
        nbits = (seed >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        noise = (pltpu.bitcast(nbits, jnp.float32) - 1.5) * 2.0  # [1, B]

        # breath blend + one-pole lowpass (src/lib.rs:531-541)
        noise_wave = saw * (1.0 - breath) + noise * breath       # [8, B]
        o = 1.0 - smooth                                          # exp_approx
        o2 = o * o
        alpha = o2 * o2 * o
        lp = lp_scr[...]
        lp = lp + (1.0 - alpha) * (noise_wave - lp)
        lp_scr[...] = lp

        # turbulence + amplitude (src/lib.rs:544-550)
        v0 = (lp * ((1.0 - turb) + noise * turb)) * amp

        # SVF coefficients (tan_approx, src/lib.rs:60-70, 553-562)
        g = ((1.0 - ff) * ff * (5.0 - 4.0 * (ff + 0.5) * (0.5 - ff))) / (
            (ff + 0.5) * (5.0 - 4.0 * (1.0 - ff) * ff) * (0.5 - ff))
        k = bw / ff
        a1 = 1.0 / (1.0 + g * (g + k))
        a2 = g * a1
        a3 = g * a2

        b = b_scr[...]
        c = c_scr[...]
        v3 = v0 - c
        v1 = a1 * b + a2 * v3
        v2 = c + a2 * b + a3 * v3
        b_scr[...] = 2.0 * v1 - b
        c_scr[...] = 2.0 * v2 - c

        audio_ref[i, :] = jnp.sum(v1, axis=0) * 0.5
        return 0

    jax.lax.fori_loop(0, params_ref.shape[0], step, 0)

    @pl.when(tt == nt - 1)
    def _store_state():
        phase_out[...] = phase_scr[...]
        seed_out[...] = seed_scr[...]
        lp_out[...] = lp_scr[...]
        b_out[...] = b_scr[...]
        c_out[...] = c_scr[...]


def synth_core_pallas(params: jnp.ndarray, state: SynthState,
                      interpret: bool = False) -> Tuple[jnp.ndarray, SynthState]:
    """Run the fused DSP core. params: [T, PACK_ROWS, B] float32 (packed as
    in the module docstring); state arrays shaped ([B], [..,8]-transposed):
      phase [B] f32, seed [B] u32, filters [B, 8] f32 (SynthState layout).
    Returns (audio [T, B], new SynthState).
    """
    T, R, B = params.shape
    assert R == PACK_ROWS, R
    assert T % CHUNK == 0, (T, CHUNK)
    assert B % LANE == 0, (B, LANE)
    nbt = B // LANE
    nt = T // CHUNK

    # state to [rows, B] layout
    phase = state.phase.reshape(1, B)
    seed = state.seed.reshape(1, B)
    lp = state.filter_state_a.T.reshape(NUM_FORMANTS, B)
    fb = state.filter_state_b.T.reshape(NUM_FORMANTS, B)
    fc = state.filter_state_c.T.reshape(NUM_FORMANTS, B)

    fvec = lambda r: pl.BlockSpec((r, LANE), lambda bt, tt: (0, bt),
                                  memory_space=pltpu.VMEM)
    grid = (nbt, nt)

    out_shapes = (
        jax.ShapeDtypeStruct((T, B), jnp.float32),       # audio
        jax.ShapeDtypeStruct((1, B), jnp.float32),       # phase
        jax.ShapeDtypeStruct((1, B), jnp.uint32),        # seed
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
        jax.ShapeDtypeStruct((NUM_FORMANTS, B), jnp.float32),
    )
    audio, phase_o, seed_o, lp_o, fb_o, fc_o = pl.pallas_call(
        _synth_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK, PACK_ROWS, LANE), lambda bt, tt: (tt, 0, bt),
                         memory_space=pltpu.VMEM),
            fvec(1), fvec(1), fvec(NUM_FORMANTS), fvec(NUM_FORMANTS), fvec(NUM_FORMANTS),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK, LANE), lambda bt, tt: (tt, bt),
                         memory_space=pltpu.VMEM),
            fvec(1), fvec(1), fvec(NUM_FORMANTS), fvec(NUM_FORMANTS), fvec(NUM_FORMANTS),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, LANE), jnp.float32),
            pltpu.VMEM((1, LANE), jnp.uint32),
            pltpu.VMEM((NUM_FORMANTS, LANE), jnp.float32),
            pltpu.VMEM((NUM_FORMANTS, LANE), jnp.float32),
            pltpu.VMEM((NUM_FORMANTS, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(params, phase, seed, lp, fb, fc)

    new_state = SynthState(
        phase=phase_o.reshape(B),
        filter_state_a=lp_o.T,
        filter_state_b=fb_o.T,
        filter_state_c=fc_o.T,
        seed=seed_o.reshape(B),
    )
    return audio, new_state


def pack_params(elems: SynthesisElem) -> jnp.ndarray:
    """[T, B]-batched SynthesisElem (fields [T, B] / [T, B, 8]) ->
    packed [T, PACK_ROWS, B] float32."""
    T, B = elems.frequency.shape
    rows = [elems.frequency[:, None, :]]
    for f in (elems.formant_freq, elems.formant_bw, elems.formant_smooth,
              elems.formant_breath, elems.formant_turb, elems.formant_amp):
        rows.append(jnp.moveaxis(f, -1, 1))      # [T, 8, B]
    packed = jnp.concatenate(rows, axis=1)        # [T, 49, B]
    pad = PACK_ROWS - packed.shape[1]
    return jnp.pad(packed, ((0, 0), (0, pad), (0, 0)))


__all__ = ["synth_core_pallas", "pack_params", "PACK_ROWS", "LANE", "CHUNK"]
