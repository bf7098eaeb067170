"""Exact value-noise phase schedule (reference f32 accumulation).

The reference's three jitter generators step a SHARED phase recurrence once
per sample (/root/reference/src/lib.rs:236-249, 287-300):

    phase += increment            # f32, rounds every add
    if phase > 1.0:               # strictly greater
        phase -= 1.0              # exact (Sterbenz), advance the lattice

Because every add rounds, the wrap schedule and the per-sample blend
fraction DRIFT from the closed form floor(k*inc): measured on the presets'
inc = 16/44100, the accumulated phase displacement reaches +0.0064 by 3.8 M
samples (86.5 s) and +0.016 by 10 M — a direct per-sample value error that
integrates through the carrier into the -47 dB long-form failure of round 3
(benchmarks/attribution.py). The cell INDEX stays within +1 of floor(k*inc)
through >=227 s, which is what keeps the kernels' windowed lattice
extraction valid (kernel_fused._n_lat_rows slack).

This module is the host-side provider of the exact schedule:

  * `state_at(inc, k)`   -> (phase, cell) after k steps — O(1) amortized via
    checkpoints every 2^20 steps + a bounded native re-simulation
    (gn_jitter_phase_schedule, ~300 M steps/s; NumPy fallback otherwise).
  * `window(inc, start, length)` -> per-sample (phi f32, cell i32) arrays
    for samples start+1 .. start+length (samples <= 0, the overlap-save
    pre-roll, report (0.0, 0) — they are masked downstream).
  * `device_window(...)` — the same, memoized as device arrays so repeat
    synthesis calls of one shape bucket upload the schedule once.

The schedule depends ONLY on the f32 jitter rate — not on seed, voice
tables, or text — so every lane of every batch shares one instance per rate.

Consumers: synth/jitter.py (XLA paths read the window arrays),
synth/kernel_fused.py (the Pallas kernels re-run the same f32 recurrence
in-kernel from a carried per-lane state — bit-identical by IEEE semantics —
and take only initial states from here), runtime/stream.py (session
continuation states).
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

import numpy as np

_CHK = 1 << 20        # checkpoint cadence (samples)


def _np_simulate(inc: np.float32, phase0: np.float32, T: int,
                 phi: np.ndarray, cell: np.ndarray) -> int:
    """Pure-NumPy twin of gn_jitter_phase_schedule (slow; fallback only)."""
    phase = np.float32(phase0)
    one = np.float32(1.0)
    wraps = 0
    for k in range(T):
        phase = np.float32(phase + inc)
        if phase > one:
            phase = np.float32(phase - one)
            wraps += 1
        phi[k] = phase
        cell[k] = wraps
    return wraps


def _simulate(inc: np.float32, phase0: np.float32, T: int,
              phi: np.ndarray, cell: np.ndarray) -> int:
    """T steps of the reference recurrence from phase0 into phi/cell
    (cell counts wraps since THIS call's start). Returns the wrap count."""
    from ..runtime.native import native_jitter_schedule

    wraps = native_jitter_schedule(inc, phase0, T, phi, cell)
    if wraps is None:
        wraps = _np_simulate(inc, phase0, T, phi, cell)
    return wraps


class PhaseSchedule:
    """Checkpointed exact phase schedule for one f32 jitter rate.

    Memory is O(max_position / 2^20) checkpoints (16 B each); window
    materialization re-simulates at most 2^20 + length steps natively.
    Thread-safe (serving feeds query from worker threads).
    """

    def __init__(self, inc: float):
        self.inc = np.float32(inc)
        assert self.inc > 0, "jitter rate must be positive"
        # checkpoint i = state after i*_CHK steps
        self._ck_phase = [np.float32(0.0)]
        self._ck_cell = [0]
        self._lock = threading.Lock()
        self._scratch_phi = np.empty(_CHK, np.float32)
        self._scratch_cell = np.empty(_CHK, np.int32)

    def _ensure_checkpoints(self, k: int) -> None:
        """Extend checkpoints to cover step k (lock held)."""
        while (len(self._ck_phase) - 1) * _CHK < k:
            w = _simulate(self.inc, self._ck_phase[-1], _CHK,
                          self._scratch_phi, self._scratch_cell)
            self._ck_phase.append(np.float32(self._scratch_phi[-1]))
            self._ck_cell.append(self._ck_cell[-1] + int(w))

    def state_at(self, k: int) -> Tuple[np.float32, int]:
        """(phase, cell) after k steps; k <= 0 is the pre-stream origin."""
        if k <= 0:
            return np.float32(0.0), 0
        k = int(k)
        with self._lock:
            self._ensure_checkpoints(k)
            i = k // _CHK
            rem = k - i * _CHK
            if rem == 0:
                return self._ck_phase[i], self._ck_cell[i]
            w = _simulate(self.inc, self._ck_phase[i], rem,
                          self._scratch_phi, self._scratch_cell)
            return (np.float32(self._scratch_phi[rem - 1]),
                    self._ck_cell[i] + int(w))

    def window(self, start: int, length: int) -> Tuple[np.ndarray, np.ndarray]:
        """Per-sample (phi f32 [length], cell i32 [length]) for absolute
        samples start+1 .. start+length. Samples <= 0 report (0.0, 0)."""
        length = int(length)
        start = int(start)
        phi = np.zeros(length, np.float32)
        cell = np.zeros(length, np.int32)
        lead = max(0, -start)              # samples <= 0 at the head
        n = length - lead
        if n <= 0:
            return phi, cell
        k0 = start + lead                  # == max(start, 0)
        with self._lock:
            self._ensure_checkpoints(k0 + n)
            i = k0 // _CHK
            rem = k0 - i * _CHK
            phase = self._ck_phase[i]
            base_cell = self._ck_cell[i]
            if rem:
                w = _simulate(self.inc, phase, rem,
                              self._scratch_phi, self._scratch_cell)
                phase = np.float32(self._scratch_phi[rem - 1])
                base_cell += int(w)
            _simulate(self.inc, phase, n, phi[lead:], cell[lead:])
        if base_cell:
            cell[lead:] += np.int32(base_cell)
        return phi, cell


_schedules: Dict[float, PhaseSchedule] = {}
_schedules_lock = threading.Lock()


def get_schedule(inc) -> PhaseSchedule:
    key = float(np.float32(inc))
    with _schedules_lock:
        s = _schedules.get(key)
        if s is None:
            s = _schedules[key] = PhaseSchedule(key)
        return s


# ---- device-array memoization ------------------------------------------------
# Repeat synthesis calls in one shape bucket (the common serving/bench case)
# must not re-upload the schedule window: key on (rate bits, start, length)
# and hold committed device arrays. Bounded: a window is ~8 B/sample and only
# distinct (rate, shape) pairs persist.

_device_cache: Dict[Tuple[float, int, int], Tuple] = {}
_device_lock = threading.Lock()
_DEVICE_CACHE_MAX = 64


def device_window(inc, start: int, length: int):
    """(phi, cell) jnp arrays for samples start+1 .. start+length, memoized.

    Safe to call under an outer jit trace (e.g. sharded_pipeline with
    sched=None): traced constants are returned but never cached — caching a
    tracer would leak it into later untraced calls."""
    import jax
    import jax.numpy as jnp

    key = (float(np.float32(inc)), int(start), int(length))
    with _device_lock:
        hit = _device_cache.get(key)
    if hit is not None:
        return hit
    phi, cell = get_schedule(inc).window(start, length)
    out = (jnp.asarray(phi), jnp.asarray(cell))
    if isinstance(out[0], jax.core.Tracer) or isinstance(out[1], jax.core.Tracer):
        return out
    with _device_lock:
        if len(_device_cache) >= _DEVICE_CACHE_MAX:
            _device_cache.clear()
        _device_cache[key] = out
    return out


__all__ = ["PhaseSchedule", "get_schedule", "device_window"]
