"""Jitter: value-noise perturbation of the parameter stream, driven by the
EXACT reference phase schedule.

Reference: Jitter iterator (/root/reference/src/lib.rs:723-805) with three
value-noise generators (src/lib.rs:213-307) sharing one phase schedule:

  * pitch noise (scalar), formant-frequency noise (8-wide), amplitude noise
    (8-wide), all stepped once per sample with increment = jitter_frequency;
  * a generator holds (current, next) lattice points and lerps; when the
    phase crosses 1.0 it draws the next lattice point from ITS OWN snapshot
    of the Lehmer stream (the three generators' streams overlap — that is
    reference behavior and we reproduce it).

The phase recurrence is `phase = f32(phase + inc); if phase > 1: phase -= 1`
per sample — every add rounds, so the per-sample fraction and the wrap
schedule DRIFT from the closed form floor(k*inc) (round-3 attribution
measured the closed-form substitute costs -47 dB at 86.5 s; VERDICT r3).
Production therefore consumes the exact schedule from synth/schedule.py:
per-sample `phi` (f32 post-wrap phase) and `cell` (i32 wrap count = lattice
cell index) arrays, computed host-side at ~300 M samples/s and memoized as
device arrays. The schedule depends only on the f32 rate, so one instance
serves every lane, seed, and voice at that rate.

All lattice points are Lehmer draws at known offsets, so the jitter stream
stays a precomputed lattice + one select + one lerp per sample — no
sequential state on device.

Lattice layout (draw d_i = i-th Lehmer draw from the jitter seed):
  pitch    L[0]=d1, L[1]=d2,            L[i>=2]   = d_{i+1}
  formant  L[0][j]=d_{3+2j}, L[1][j]=d_{4+2j}, L[m>=2][j] = d_{19+8(m-2)+j}
  amp      L[0][j]=d_{19+2j}, L[1][j]=d_{20+2j}, L[m>=2][j] = d_{35+8(m-2)+j}
(the interleaved heads mirror ValueNoise::new / ArrayValueNoise::new).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import NUM_FORMANTS
from ..core.rng import np_lehmer_draws
from .elem import SynthesisElem

# static upper bound on the normalized jitter rate (88 Hz at 44.1 kHz);
# blockwise evaluation sizes its lattice window from this. Voices are
# validated against it at compile time.
MAX_JITTER_INC = 0.002


class JitterLattice(NamedTuple):
    """Precomputed value-noise lattices for one (seed, max_samples)."""

    pitch: jnp.ndarray     # [W+2]
    formant: jnp.ndarray   # [W+2, 8]
    amp: jnp.ndarray       # [W+2, 8]


def build_lattice(seed: int, num_samples: int, jitter_frequency: float) -> JitterLattice:
    """Host-side lattice construction (cheap: ~16 Hz worth of points)."""
    W = int(np.floor(num_samples * float(jitter_frequency))) + 2
    n_draws = 34 + 8 * (W + 2)  # covers amp-lattice row W+1 (d_{35+8(W-1)..})
    d = np_lehmer_draws(seed, n_draws)  # d[i] == draw d_{i+1}

    def dr(i):  # 1-based draw index like the docstring
        return d[i - 1]

    pitch = np.empty(W + 2, np.float32)
    pitch[0], pitch[1] = dr(1), dr(2)
    pitch[2:] = d[2:W + 2]                     # rows m>=2: d_{m+1}
    formant = np.empty((W + 2, NUM_FORMANTS), np.float32)
    amp = np.empty((W + 2, NUM_FORMANTS), np.float32)
    formant[0] = d[2:18:2]                     # d_{3+2j}
    formant[1] = d[3:19:2]                     # d_{4+2j}
    amp[0] = d[18:34:2]                        # d_{19+2j}
    amp[1] = d[19:35:2]                        # d_{20+2j}
    formant[2:] = d[18:18 + 8 * W].reshape(W, NUM_FORMANTS)   # d_{19+8(m-2)+j}
    amp[2:] = d[34:34 + 8 * W].reshape(W, NUM_FORMANTS)       # d_{35+8(m-2)+j}

    return JitterLattice(pitch, formant, amp)  # numpy leaves; jit ingests them


def sched_slice(sched, start, length: int):
    """Slice a (phi, cell) schedule pair at a (possibly traced) start index.
    `length` must be static. Used by the blockwise scan paths."""
    phi, cell = sched
    return (jax.lax.dynamic_slice(phi, (start,), (length,)),
            jax.lax.dynamic_slice(cell, (start,), (length,)))


def jitter_values(lattice: JitterLattice, phi, cell):
    """Per-sample noise values: (pitch [T], formant [T,8], amp [T,8]).

    `phi` (f32 [T]) and `cell` (i32 [T], absolute lattice cell = wrap
    count) come from the exact phase schedule (synth/schedule.py) — the
    reference's own f32 recurrence, so sample values match the oracle
    generators bit-for-bit. Cells clip at the lattice edge (tail samples
    past the utterance read the last cell, masked downstream)."""
    T = phi.shape[0]
    nlat = lattice.pitch.shape[0]
    i = jnp.minimum(jnp.asarray(cell, jnp.int32), nlat - 2)
    phi2 = jnp.asarray(phi, jnp.float32)[:, None]              # [T,1]

    # a T-sample window spans at most ceil(T*inc)+1 lattice cells (+1 more
    # of schedule drift); slice that window and select with an exact
    # one-hot matmul (TPU gathers are slow). The window size uses the
    # static bound MAX_JITTER_INC (validated at voice-compile time).
    K = int(np.ceil(T * MAX_JITTER_INC)) + 3   # cells in window (+next)
    Kw = min(K + 1, nlat)
    # window base = the first sample's cell (nondecreasing, so it covers
    # the whole block); clamp so the slice stays in range
    i0 = jnp.clip(i[0], 0, nlat - Kw)
    rel = jnp.clip(i - i0, 0, Kw - 2)
    onehot = jax.nn.one_hot(rel, Kw, dtype=jnp.float32)          # [T, Kw]
    onehot_n = jax.nn.one_hot(rel + 1, Kw, dtype=jnp.float32)

    pw = jax.lax.dynamic_slice(jnp.asarray(lattice.pitch), (i0,), (Kw,))
    fw = jax.lax.dynamic_slice(jnp.asarray(lattice.formant), (i0, 0),
                               (Kw, lattice.formant.shape[1]))
    aw = jax.lax.dynamic_slice(jnp.asarray(lattice.amp), (i0, 0),
                               (Kw, lattice.amp.shape[1]))

    # precision=HIGHEST: exact one-hot selection (TPU MXU default precision
    # would quantize the lattice values — see sequencer.py)
    HI = jax.lax.Precision.HIGHEST

    def lerp(win):
        cur = jnp.matmul(onehot, win, precision=HI)
        nxt = jnp.matmul(onehot_n, win, precision=HI)
        return cur * (1.0 - phi2) + nxt * phi2

    pitch = lerp(pw[:, None])[:, 0]
    formant = lerp(fw)
    amp = lerp(aw)
    return pitch, formant, amp


def apply_jitter(elems: SynthesisElem, lattice: JitterLattice,
                 delta_frequency, delta_formant_freq, delta_amplitude,
                 sched: Tuple, mask=None) -> SynthesisElem:
    """Apply the reference jitter update (src/lib.rs:753-777) to a [T, ...]
    per-sample parameter stream.

    `sched` = (phi [T], cell [T]) from the exact phase schedule for this
    block's absolute sample positions (synth/schedule.py).

    `mask` [T] (optional) disables jitter on invalid samples (stream pre-roll
    and tail) — required by the overlap-save split path, which needs the
    pre-roll carrier frequency to stay at the exact silent-frame constant.
    """
    phi, cell = sched
    pitch, formant, amp_n = jitter_values(lattice, phi, cell)
    if mask is not None:
        m = mask.astype(jnp.float32)
        pitch = pitch * m
        formant = formant * m[:, None]
        amp_n = amp_n * m[:, None] - (1.0 - m[:, None])  # masked -> n=-1 -> delta 0

    frequency = elems.frequency + pitch * jnp.float32(delta_frequency)
    formant_freq = elems.formant_freq + formant * jnp.float32(delta_formant_freq)
    # attenuate-only amplitude: amp *= 1 - (n+1)/2 * delta
    amp_delta = (amp_n + 1.0) * (0.5 * jnp.asarray(delta_amplitude, jnp.float32))
    formant_amp = elems.formant_amp * (1.0 - amp_delta)

    return elems._replace(
        frequency=frequency.astype(jnp.float32),
        formant_freq=formant_freq.astype(jnp.float32),
        formant_amp=formant_amp.astype(jnp.float32),
    )


__all__ = ["JitterLattice", "build_lattice", "jitter_values", "apply_jitter",
           "sched_slice"]
