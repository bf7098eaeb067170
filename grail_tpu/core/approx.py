"""Fast math approximations — these exact formulas are *part of the sound*.

The reference synthesizer does not use true tan/exp; it uses cheap polynomial
approximations, and the output waveform depends on their exact shape. We keep
the formulas identical (reference: /root/reference/src/lib.rs:60-82) but
evaluate them as vectorized JAX ops so XLA can fuse them into the synthesis
kernel.

Both functions are pure elementwise math (add/mul/div only) and map 1:1 onto
the TPU VPU; no transcendental units are touched.
"""

from __future__ import annotations



def tan_approx(x):
    """Approximation of tan(pi * x), accurate for x in [0, 0.5).

    Derived from the Bhaskara-I sine/cosine approximations
    (reference src/lib.rs:60-70). Used to compute the SVF integrator gain
    g = tan(pi * f_normalized).
    """
    return ((1.0 - x) * x * (5.0 - 4.0 * (x + 0.5) * (0.5 - x))) / (
        (x + 0.5) * (5.0 - 4.0 * (1.0 - x) * x) * (0.5 - x)
    )


def exp_approx(x):
    """Approximation of exp(-2*pi*x) ~= (1 - x)^5, accurate for x in [0, 1].

    (reference src/lib.rs:72-82). Used for the one-pole lowpass coefficient
    alpha = exp(-2*pi*f_cutoff_normalized).
    """
    o = 1.0 - x
    o2 = o * o
    return o2 * o2 * o


def np_tan_approx(x):
    """NumPy float32 variant with the identical operation order (for oracles)."""
    import numpy as np

    x = np.asarray(x, np.float32)
    half = np.float32(0.5)
    one = np.float32(1.0)
    num = (one - x) * x * (np.float32(5.0) - np.float32(4.0) * (x + half) * (half - x))
    den = (x + half) * (np.float32(5.0) - np.float32(4.0) * (one - x) * x) * (half - x)
    return (num / den).astype(np.float32)


def np_exp_approx(x):
    import numpy as np

    x = np.asarray(x, np.float32)
    o = (np.float32(1.0) - x).astype(np.float32)
    o2 = (o * o).astype(np.float32)
    return (o2 * o2 * o).astype(np.float32)


__all__ = ["tan_approx", "exp_approx", "np_tan_approx", "np_exp_approx"]
