"""Jitter: closed-form value-noise perturbation of the parameter stream.

Reference: Jitter iterator (/root/reference/src/lib.rs:723-805) with three
value-noise generators (src/lib.rs:213-307) sharing one phase schedule:

  * pitch noise (scalar), formant-frequency noise (8-wide), amplitude noise
    (8-wide), all stepped once per sample with increment = jitter_frequency;
  * a generator holds (current, next) lattice points and lerps; when the
    phase crosses 1.0 it draws the next lattice point from ITS OWN snapshot
    of the Lehmer stream (the three generators' streams overlap — that is
    reference behavior and we reproduce it).

Because the increment is constant, the wrap schedule is deterministic:
sample k (1-based step count) sits in lattice cell i = floor(k*inc) with
fraction phi = k*inc - i. All lattice points are Lehmer draws at known
offsets, so the whole jitter stream is a precomputed lattice + one gather +
one lerp per sample — no sequential state.

Lattice layout (draw d_i = i-th Lehmer draw from the jitter seed):
  pitch    L[0]=d1, L[1]=d2,            L[i>=2]   = d_{i+1}
  formant  L[0][j]=d_{3+2j}, L[1][j]=d_{4+2j}, L[m>=2][j] = d_{19+8(m-2)+j}
  amp      L[0][j]=d_{19+2j}, L[1][j]=d_{20+2j}, L[m>=2][j] = d_{35+8(m-2)+j}
(the interleaved heads mirror ValueNoise::new / ArrayValueNoise::new).
"""

from __future__ import annotations

from typing import NamedTuple

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


def jitter_values(lattice: JitterLattice, num_samples: int, jitter_frequency,
                  offset=0):
    """Per-sample noise values: (pitch [T], formant [T,8], amp [T,8]).

    `offset` shifts the sample window for blockwise evaluation.

    Envelope note: the cell schedule computes ph = f32(k) * inc with k the
    ABSOLUTE 1-based sample index, so past 2^24 samples (~6.3 min at
    44.1 kHz) f32(k) rounds to even and cell boundaries/fractions quantize
    (±4-sample staircase at 2^25 — sub-gate noise-texture error, never a
    discontinuity, and bit-consistent across the xla/fused/split paths,
    which all use this same formula). Unbounded sessions avoid it
    entirely: StreamSession rebases the jitter origin before positions
    grow that large (stream.py:_maybe_rebase_jitter)."""
    T = int(num_samples)
    inc = jnp.float32(jitter_frequency)
    offset = jnp.asarray(offset, jnp.int32)
    k = (jnp.arange(1, T + 1, dtype=jnp.int32) + offset).astype(jnp.float32)
    ph = k * inc
    i = jnp.floor(ph).astype(jnp.int32)
    phi = (ph - i.astype(jnp.float32))[:, None]  # [T,1]
    nlat = lattice.pitch.shape[0]
    i = jnp.minimum(i, nlat - 2)

    # a T-sample window spans at most ceil(T*inc)+1 lattice cells; slice that
    # window and select with an exact one-hot matmul (TPU gathers are slow).
    # inc is traced, so the window size uses the static bound MAX_JITTER_INC
    # (validated at voice-compile time).
    K = int(np.ceil(T * MAX_JITTER_INC)) + 2   # cells in window (+next)
    Kw = min(K + 1, nlat)
    # lower clamp: for negative offsets (overlap-save pre-roll) the raw
    # floor goes negative; dynamic_slice would clamp the slice start to 0
    # while rel still subtracted the unclamped i0, misaligning every cell
    i0 = jnp.clip(jnp.floor((offset + 1).astype(jnp.float32) * inc)
                  .astype(jnp.int32), 0, nlat - Kw)
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
        return cur * (1.0 - phi) + nxt * phi

    pitch = lerp(pw[:, None])[:, 0]
    formant = lerp(fw)
    amp = lerp(aw)
    return pitch, formant, amp


def apply_jitter(elems: SynthesisElem, lattice: JitterLattice, jitter_frequency,
                 delta_frequency, delta_formant_freq, delta_amplitude,
                 offset=0, mask=None) -> SynthesisElem:
    """Apply the reference jitter update (src/lib.rs:753-777) to a [T, ...]
    per-sample parameter stream.

    `mask` [T] (optional) disables jitter on invalid samples (stream pre-roll
    and tail) — required by the overlap-save split path, which needs the
    pre-roll carrier frequency to stay at the exact silent-frame constant.
    """
    T = elems.frequency.shape[0]
    pitch, formant, amp_n = jitter_values(lattice, T, jitter_frequency, offset)
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


__all__ = ["JitterLattice", "build_lattice", "jitter_values", "apply_jitter"]
