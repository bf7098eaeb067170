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


def tan_approx_parts(x):
    """(numerator N, denominator D) with tan_approx(x) == N/D, factored to
    share subexpressions: N = q*(5-4p), D = p*(5-4q) with p=(x+0.5)(0.5-x),
    q=(1-x)x. D differs from tan_approx's denominator by one product
    re-association (~1 ulp); use where the division is composed into a
    larger single-division expression (synth/kernel_fused.py derives the
    SVF coefficients a1,a2,a3 from N, D and ONE reciprocal). This is the
    same Bhaskara polynomial as tan_approx — keep both in this module so
    the formula (part of the sound) has one home.
    """
    u = 1.0 - x
    v = x + 0.5
    p = v * (0.5 - x)
    q = u * x
    return q * (5.0 - 4.0 * p), p * (5.0 - 4.0 * q)


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


__all__ = ["tan_approx", "tan_approx_parts", "exp_approx",
           "np_tan_approx", "np_exp_approx"]
