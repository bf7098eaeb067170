"""Lehmer LCG random numbers, reproduced bit-exactly and *parallelized*.

The reference generator (/root/reference/src/lib.rs:36-55) is the affine
recurrence on u32:

    state' = state * 16807 + 1        (mod 2^32)

and converts a state to a float in [-1, 1] with the IEEE-754 mantissa trick:

    bits = (state >> 9) | 0x3F800000   ->  float in [1, 2)
    value = (float - 1.5) * 2.0

The reference steps this sequentially, once per audio sample. On TPU we need
the k-th state *in closed form* so that a whole block of samples can draw its
noise in parallel:

    state_k(seed) = A^k * seed + S_k          (mod 2^32),
    S_k = sum_{i<k} A^i  (with C=1)

A^k and S_k depend only on k, so we precompute them once per length with a
log-step doubling construction (`lehmer_affine`) and then any batch of seeds
gets its entire noise stream as one vectorized expression — bit-identical to
the sequential reference.
"""

from __future__ import annotations

import numpy as np

from .constants import LEHMER_A

_U32 = np.uint32
_MASK = np.uint64(0xFFFFFFFF)

# cache: length -> (powA, S) uint32 arrays of that length
_affine_cache: dict = {}


def lehmer_affine(n: int):
    """Return (powA, S): uint32 arrays of length n+1 with

        powA[k] = A^k mod 2^32,   S[k] = sum_{i<k} A^i mod 2^32

    so that the state after k steps from `seed` is powA[k]*seed + S[k].
    Built with log2(n) doubling steps: S_{m+k} = A^k * S_m + S_k.
    """
    n = int(n)
    # reuse the largest cached table that covers n
    for cap in sorted(_affine_cache):
        if cap >= n:
            powA, S = _affine_cache[cap]
            return powA[: n + 1], S[: n + 1]

    powA = np.array([1, LEHMER_A], dtype=np.uint64)
    S = np.array([0, 1], dtype=np.uint64)
    while len(powA) < n + 1:
        m = len(powA)
        # extend indices [m, 2m-2]: composing j steps after (m-1) steps gives
        #   A^(m-1+j) = A^(m-1) * A^j   and   S_(m-1+j) = A^j * S_(m-1) + S_j
        new_powA = (powA[m - 1] * powA[1:m]) & _MASK
        new_S = (powA[1:m] * S[m - 1] + S[1:m]) & _MASK
        powA = np.concatenate([powA, new_powA])
        S = np.concatenate([S, new_S])
    powA32 = powA[: n + 1].astype(_U32)
    S32 = S[: n + 1].astype(_U32)
    if n <= (1 << 22):  # don't cache unboundedly large tables
        _affine_cache[n] = (powA32, S32)
    return powA32, S32


def lehmer_states(seed, n: int) -> np.ndarray:
    """uint32 states after 1..n steps from `seed` (vectorized, host-side)."""
    powA, S = lehmer_affine(n)
    seed = np.uint64(int(seed) & 0xFFFFFFFF)
    states = (powA[1:].astype(np.uint64) * seed + S[1:].astype(np.uint64)) & _MASK
    return states.astype(_U32)


def np_random_f32_from_state(states: np.ndarray) -> np.ndarray:
    """Convert uint32 Lehmer states to floats in [-1, 1] (bit-exact)."""
    bits = ((states.astype(_U32) >> _U32(9)) | _U32(0x3F800000)).view(np.float32)
    return ((bits - np.float32(1.5)) * np.float32(2.0)).astype(np.float32)


def np_lehmer_draws(seed, n: int) -> np.ndarray:
    """The first n float draws of the reference RNG from `seed`."""
    return np_random_f32_from_state(lehmer_states(seed, n))


class NpLehmer:
    """Stateful sequential reference RNG (oracle use only)."""

    def __init__(self, seed: int = 0):
        self.state = int(seed) & 0xFFFFFFFF

    def next_f32(self) -> np.float32:
        self.state = (self.state * LEHMER_A + 1) & 0xFFFFFFFF
        bits = np.uint32((self.state >> 9) | 0x3F800000)
        f = bits.view(np.float32)
        return np.float32((f - np.float32(1.5)) * np.float32(2.0))


# ---------------------------------------------------------------------------
# Device-side (JAX) variants
# ---------------------------------------------------------------------------

def random_f32_from_state(states):
    """JAX version of the uint32->[-1,1] float conversion."""
    import jax
    import jax.numpy as jnp

    bits = (states.astype(jnp.uint32) >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return (f - 1.5) * 2.0


def device_lehmer_states(seed, n: int):
    """States after 1..n steps on-device: powA/S tables are host constants.

    `seed` may be a scalar or a batch array; broadcasting gives
    states[..., k] for every batch element with one fused multiply-add.
    """
    import jax.numpy as jnp

    powA, S = lehmer_affine(n)
    powA_d = jnp.asarray(powA[1:], dtype=jnp.uint32)
    S_d = jnp.asarray(S[1:], dtype=jnp.uint32)
    seed = jnp.asarray(seed, dtype=jnp.uint32)
    if seed.ndim:
        return powA_d * seed[..., None] + S_d
    return powA_d * seed + S_d


__all__ = [
    "lehmer_affine",
    "lehmer_skip",
    "lehmer_states",
    "np_random_f32_from_state",
    "np_lehmer_draws",
    "NpLehmer",
    "random_f32_from_state",
    "device_lehmer_states",
]


def lehmer_skip(p: int):
    """(A^p mod 2^32, S_p mod 2^32) for ONE skip distance, as host ints in
    O(log p) affine exponentiation — the scalar twin of lehmer_affine.
    lehmer_affine materializes length-n arrays; traced at multi-million-
    sample T those become megabytes of literal constants in the jit graph
    (a 60 s utterance produced a 63 MB MLIR module the remote TPU compiler
    rejected). Split-path segment seeds only need a handful of positions."""
    M = 0xFFFFFFFF
    a, b = LEHMER_A, 1          # one step: x -> A*x + 1
    ra, rb = 1, 0               # identity
    p = int(p)
    if p < 0:
        # a negative Python int never right-shifts to 0 — this would hang
        # at trace time; callers must clamp (segment start - WARMUP >= 0)
        raise ValueError(f"lehmer_skip distance must be >= 0, got {p}")
    while p:
        if p & 1:
            ra, rb = (a * ra) & M, (a * rb + b) & M
        a, b = (a * a) & M, (a * b + b) & M
        p >>= 1
    return ra, rb
