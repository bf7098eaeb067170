"""Formant-vector helpers — the reference `Array` type's operation set.

The reference wraps `[f32; 8]` in an `Array` struct with arithmetic +
blend/map helpers (/root/reference/src/lib.rs:86-211). In grail_tpu a
"formant vector" is simply the trailing `[..., NUM_FORMANTS]` axis of a jnp
array — native +,-,*,/ and jnp reductions replace the operator impls. This
module provides the remaining named helpers for API parity (and for porting
code written against the reference):

  Array::new/from_func  -> jnp.asarray / construction
  Array::splat          -> splat
  Array::map/map2       -> plain jnp elementwise expressions
  Array::sum            -> jnp.sum(..., axis=-1)
  Array::min            -> jnp.minimum
  Array::blend          -> blend
  Array::blend_multiple -> blend_multiple
  Array::tan_approx     -> core.approx.tan_approx
  Array::exp_approx     -> core.approx.exp_approx
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import NUM_FORMANTS


def splat(value, shape=()) -> jnp.ndarray:
    """Array::splat: fill a formant vector with one value (src/lib.rs:103-107)."""
    return jnp.full(tuple(shape) + (NUM_FORMANTS,), value, jnp.float32)


def blend(a, b, alpha):
    """Array::blend: lerp by a scalar alpha (src/lib.rs:133-137)."""
    return a * (1.0 - alpha) + b * alpha


def blend_multiple(a, b, alpha):
    """Array::blend_multiple: lerp by a per-formant alpha vector
    (src/lib.rs:139-143)."""
    return a * (1.0 - alpha) + b * alpha


__all__ = ["splat", "blend", "blend_multiple"]
