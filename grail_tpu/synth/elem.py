"""SynthesisElem: the per-sample synthesis parameter frame, as a JAX pytree.

Reference: /root/reference/src/lib.rs:316-460. The reference stores one
scalar frequency plus six 8-wide formant arrays; we store the same fields as
arrays with arbitrary leading batch/time dims, so a single `SynthesisElem`
value can be one frame, a whole utterance score [T, ...], or a batched score
[B, T, ...]. All frequency-valued fields are normalized to the sample rate.

All constructors/ops mirror the reference semantics exactly:
  silent         src/lib.rs:367-377
  blend          src/lib.rs:404-414
  resample       src/lib.rs:418-440  (Nyquist clamp; zero amps above Nyquist)
  copy_with_frequency src/lib.rs:445-450
  copy_silent    src/lib.rs:454-459
The `new`/`new_phoneme` constructors (src/lib.rs:343-364, 381-401) live as
the voice-compiler's numpy mirrors (voices/voice.py:_np_new_phoneme /
_np_resample — host-path, sequential f32 amp fold for bit-parity with the
reference); the oracle has its own NpElem versions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.constants import NUM_FORMANTS


class SynthesisElem(NamedTuple):
    """Pytree of synthesis parameters. Leading dims are free (batch/time)."""

    frequency: jnp.ndarray      # [...], base (carrier) frequency
    formant_freq: jnp.ndarray   # [..., NUM_FORMANTS]
    formant_bw: jnp.ndarray     # [..., NUM_FORMANTS]
    formant_smooth: jnp.ndarray  # [..., NUM_FORMANTS]
    formant_breath: jnp.ndarray  # [..., NUM_FORMANTS]
    formant_turb: jnp.ndarray   # [..., NUM_FORMANTS]
    formant_amp: jnp.ndarray    # [..., NUM_FORMANTS]

    # ---- ops ----------------------------------------------------------

    def blend(self, other: "SynthesisElem", alpha) -> "SynthesisElem":
        """lerp(self, other, alpha): alpha may broadcast over leading dims."""
        a = jnp.asarray(alpha, jnp.float32)
        af = a[..., None] if a.ndim else a

        def lerp(x, y, aa):
            return x * (1.0 - aa) + y * aa

        return SynthesisElem(
            frequency=lerp(self.frequency, other.frequency, a),
            formant_freq=lerp(self.formant_freq, other.formant_freq, af),
            formant_bw=lerp(self.formant_bw, other.formant_bw, af),
            formant_smooth=lerp(self.formant_smooth, other.formant_smooth, af),
            formant_breath=lerp(self.formant_breath, other.formant_breath, af),
            formant_turb=lerp(self.formant_turb, other.formant_turb, af),
            formant_amp=lerp(self.formant_amp, other.formant_amp, af),
        )

    def resample(self, old_sample_rate, new_sample_rate) -> "SynthesisElem":
        """Rescale all normalized frequencies to a new sample rate.

        Matches the reference: carrier and formant freqs clamp to Nyquist
        (0.5); amplitudes of formants whose *unclamped* scaled frequency
        exceeds Nyquist are zeroed; breath/turb are untouched.
        """
        scale = jnp.float32(old_sample_rate / new_sample_rate)
        scaled_ff = self.formant_freq * scale
        return self._replace(
            frequency=jnp.minimum(self.frequency * scale, 0.5),
            formant_freq=jnp.minimum(scaled_ff, 0.5),
            formant_bw=self.formant_bw * scale,
            formant_smooth=self.formant_smooth * scale,
            formant_amp=jnp.where(scaled_ff > 0.5, 0.0, self.formant_amp),
        )

    def copy_with_frequency(self, frequency) -> "SynthesisElem":
        return self._replace(frequency=jnp.minimum(jnp.asarray(frequency, jnp.float32), 0.5))

    def copy_silent(self) -> "SynthesisElem":
        return self._replace(formant_amp=jnp.zeros_like(self.formant_amp))

    # ---- constructors ---------------------------------------------------

    @staticmethod
    def silent(shape=()) -> "SynthesisElem":
        """The reference's silent frame: 0.25 freqs, zero breath/turb/amp."""
        f = jnp.full(shape, 0.25, jnp.float32)
        q = jnp.full(shape + (NUM_FORMANTS,), 0.25, jnp.float32)
        z = jnp.zeros(shape + (NUM_FORMANTS,), jnp.float32)
        return SynthesisElem(f, q, q, q, z, z, z)

    # ---- utilities -------------------------------------------------------

    def __getitem__(self, idx) -> "SynthesisElem":  # type: ignore[override]
        return SynthesisElem(*(f[idx] for f in self))

    @property
    def batch_shape(self):
        return self.formant_freq.shape[:-1]


def stack_elems(elems) -> SynthesisElem:
    """Stack a python list of SynthesisElems along a new leading axis."""
    return SynthesisElem(*(jnp.stack(fs) for fs in zip(*elems)))


__all__ = ["SynthesisElem", "stack_elems"]
