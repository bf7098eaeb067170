"""Vectorized sequencer: Score -> per-sample SynthesisElem frames.

The reference Sequencer (/root/reference/src/lib.rs:838-953) is a pull-based
state machine: a (cur, next) element pair, a countdown `time -= 1/sr`, and a
per-sample crossfade `next.blend(cur, alpha)` with
alpha = min(time / cur.blend_length, 1) — i.e. each element holds its value
and linearly fades into the next over the last `blend_length` seconds of its
own interval; silent elements blend amplitude only.

Key observation for TPU: the state machine is *stateless given cumulative
element end-times*. For sample k (0-based):

    s_k   = (k + 1) / sr                     (total countdown consumed)
    j(k)  = min { m : C_m >= s_k },  C_m = sum_{i<=m} length_i
    t_k   = C_{j} - s_k                      (the reference's `time` value)
    alpha = min(t_k / blend_length_j, 1)

so the whole expansion is a searchsorted + two gathers + a 4-way masked
blend — no sequential loop, fully batchable, and XLA fuses it into the
synthesis kernel's input stream. Samples at or beyond floor(C_last * sr) are
invalid (the reference iterator ends there); we emit silence and a mask.

Element boundaries are materialized as *integer sample indices*
(n_m = floor(C_m * sr)), which keeps the searchsorted exact in float32 at any
utterance length: C_m >= (k+1)/sr  <=>  n_m >= k+1 for integer k.

Zero-length padding elements are never selected (searchsorted side='left'
skips duplicate boundaries), which is what makes fixed-shape padded scores
work — and also mirrors the reference's fade-to-silence at stream end.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .elem import SynthesisElem
from .score import Score


def _selection_prelude(score: Score, sample_rate, num_samples: int, offset):
    """The shared per-sample selection math: element index by compare-count,
    one-hot selector, blend alpha, sound flags, validity. ONE implementation
    for expand_score AND expand_frequency — the split path integrates
    expand_frequency's output to obtain segment-boundary phases, so the two
    must stay ARITHMETIC-IDENTICAL; sharing the code makes divergence
    impossible instead of merely discouraged.

    Returns (sel, shift, a, hs_cur, hs_nxt, valid) where `sel(tab)` is the
    exact one-hot matmul selector and `shift(tab)` the next-element table
    view."""
    E = score.num_elems
    T = int(num_samples)
    sr = jnp.float32(sample_rate)
    dt = jnp.float32(1.0) / sr

    # host-precomputed sequential f32 cumsum (Score.build) — one boundary
    # source for device math and host bookkeeping alike
    C = jnp.asarray(score.cum_length, jnp.float32)             # [E] end-times
    n = jnp.floor(C * sr).astype(jnp.int32)                   # [E] end samples

    k1 = jnp.arange(1, T + 1, dtype=jnp.int32) + jnp.asarray(offset, jnp.int32)
    valid = (k1 >= 1) & (k1 <= n[-1])  # k1 < 1: pre-roll (overlap-save warmup)

    # TPU-native "gather": element index by compare-count (== searchsorted
    # left over the non-decreasing boundary array), then ALL per-sample
    # lookups as one-hot matmuls. One-hot selection is numerically exact and
    # rides the MXU; true gathers lower to slow scalar loops on TPU.
    below = (n[None, :] < k1[:, None])                         # [T, E]
    j = jnp.sum(below.astype(jnp.int32), axis=-1)
    j = jnp.minimum(j, E - 1)
    has_next = (j + 1) < E

    onehot = jax.nn.one_hot(j, E, dtype=jnp.float32)           # [T, E]

    # precision=HIGHEST is REQUIRED for exactness: the TPU MXU's default
    # matmul precision is bf16-ish, which would quantize every selected
    # parameter by ~0.4% (measured -40 dB broadband error vs CPU)
    def sel(tab):                                  # [E(,F)] -> [T(,F)]
        return jnp.matmul(onehot, tab.astype(jnp.float32),
                          precision=jax.lax.Precision.HIGHEST)

    # next-element tables: row m holds element min(m+1, E-1)
    def shift(tab):
        return jnp.concatenate([tab[1:], tab[-1:]], axis=0)

    s = k1.astype(jnp.float32) * dt
    t = sel(C) - s                                             # reference `time`
    # lower clamp: s_k = f32(k1)*dt can round ABOVE the element's f32
    # cumulative end time while the integer boundary test still selects the
    # element (n_j >= k1), making t spuriously negative — a sign the
    # reference's countdown never produces in-element. Sub-audible for
    # normal blend lengths, but a zero-blend element's 1e-12 epsilon would
    # amplify t = -1 ulp into alpha ~ -1.5e7 (a full-scale one-sample
    # click). alpha = 0 is the benign corner (emit the next element).
    a = jnp.clip(t / sel(score.blend_length), 0.0, 1.0)

    hs_f = score.has_sound.astype(jnp.float32)
    hs_cur = sel(hs_f) > 0.5
    hs_nxt = (sel(shift(hs_f)) > 0.5) & has_next
    return sel, shift, a, hs_cur, hs_nxt, valid


def expand_score(score: Score, sample_rate, num_samples: int,
                 offset=0) -> Tuple[SynthesisElem, jnp.ndarray]:
    """Expand a single-utterance Score ([E] leading dim) into per-sample
    params [T, ...] plus a validity mask [T]. Use jax.vmap for batches.

    `offset` (static or traced) shifts the sample window: samples
    [offset, offset+T) of the utterance — this is what lets the full
    pipeline run block-by-block without ever materializing [T_total, ...]
    parameter arrays in HBM.
    """
    sel, shift, a, hs_cur, hs_nxt, valid = _selection_prelude(
        score, sample_rate, num_samples, offset)

    vec_fields = (score.elem.formant_freq, score.elem.formant_bw,
                  score.elem.formant_smooth, score.elem.formant_breath,
                  score.elem.formant_turb, score.elem.formant_amp)
    cur = SynthesisElem(sel(score.elem.frequency),
                        *(sel(f) for f in vec_fields))
    nxt = SynthesisElem(sel(shift(score.elem.frequency)),
                        *(sel(shift(f)) for f in vec_fields))

    sil = SynthesisElem.silent(())

    af = a[:, None]                # [T, 1]
    m_cur_v = hs_cur[:, None]
    m_nxt_v = hs_nxt[:, None]

    def pick(cur_f, nxt_f, sil_f):
        # reference 4-case match (src/lib.rs:891-931):
        #   (sound, sound)   -> next.blend(cur, a): lerp all fields
        #   (sound, silent)  -> fields of cur (amp handled separately)
        #   (silent, sound)  -> fields of next
        #   (silent, silent) -> SynthesisElem::silent()
        vec = cur_f.ndim == 2
        aa = af if vec else a
        mc = m_cur_v if vec else hs_cur
        mn = m_nxt_v if vec else hs_nxt
        both = cur_f * aa + nxt_f * (1.0 - aa)
        return jnp.where(mc & mn, both, jnp.where(mc, cur_f, jnp.where(mn, nxt_f, sil_f)))

    fields = {
        name: pick(getattr(cur, name), getattr(nxt, name), getattr(sil, name))
        for name in ("frequency", "formant_freq", "formant_bw", "formant_smooth",
                     "formant_breath", "formant_turb")
    }

    # amplitude: lerp when both sound; fade-out (amp*a) into a silent next;
    # fade-in (amp*(1-a)) out of a silent cur; zero when both silent
    amp_both = cur.formant_amp * af + nxt.formant_amp * (1.0 - af)
    amp = jnp.where(
        m_cur_v & m_nxt_v, amp_both,
        jnp.where(m_cur_v, cur.formant_amp * af,
                  jnp.where(m_nxt_v, nxt.formant_amp * (1.0 - af), 0.0)),
    )

    out = SynthesisElem(formant_amp=amp.astype(jnp.float32), **{
        kk: v.astype(jnp.float32) for kk, v in fields.items()})

    # invalid samples -> silent frame (keeps downstream math finite)
    out = SynthesisElem(*(
        jnp.where(valid if f.ndim == 1 else valid[:, None], f, s0)
        for f, s0 in zip(out, sil)))

    return out, valid


def expand_frequency(score: Score, sample_rate, num_samples: int, offset=0):
    """Frequency stream only: [T] carrier frequency + validity mask.

    MUST stay arithmetic-identical to expand_score's frequency output — the
    overlap-save split path integrates this stream (Q32) to obtain exact
    segment-boundary carrier phases, so any divergence breaks phase
    continuity at segment seams (tested in test_split.py). Sharing
    _selection_prelude makes that structural: there is exactly one copy of
    the boundary/alpha math.
    """
    sel, shift, a, hs_cur, hs_nxt, valid = _selection_prelude(
        score, sample_rate, num_samples, offset)

    cur_f = sel(score.elem.frequency)
    nxt_f = sel(shift(score.elem.frequency))

    sil_f = jnp.float32(0.25)
    both = cur_f * a + nxt_f * (1.0 - a)
    freq = jnp.where(hs_cur & hs_nxt, both,
                     jnp.where(hs_cur, cur_f, jnp.where(hs_nxt, nxt_f, sil_f)))
    freq = jnp.where(valid, freq.astype(jnp.float32), sil_f)
    return freq, valid


__all__ = ["expand_score", "expand_frequency"]
