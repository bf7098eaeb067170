#!/usr/bin/env python3
"""Fidelity harness: spectral error of every fast path vs the sequential
float32 oracle (the driver's < -60 dB metric). JSON lines.

Runs on CPU by default (the oracle is host-side anyway); pass --tpu to
measure the pallas backend on hardware.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--text", default="aeae")
    ap.add_argument("--voice", default="generic",
                    help="voice preset for both oracle and fast paths")
    ap.add_argument("--language", default="generic")
    ap.add_argument("--contour", action="store_true",
                    help="gate the contour-intonator frontend: its "
                         "PhonemeElems go through the oracle's reference "
                         "DSP chain (oracle_dsp_chain)")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="resample rate in Hz (e.g. 22050/48000): both "
                         "oracle voice spec and fast paths retarget")
    ap.add_argument("--label", default="",
                    help="config label recorded in the JSON lines")
    ap.add_argument("--paths", nargs="*", default=None,
                    help="subset of paths to run (long-form configs: the "
                         "oracle is the cost; paths are cheap)")
    ap.add_argument("--gold-only", action="store_true",
                    help="compute + disk-cache the oracle waveform, then "
                         "exit (CPU pre-warm so a TPU capture window only "
                         "pays device time)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))

    import dataclasses

    from grail_tpu import languages as lang_mod
    from grail_tpu.api import text_to_phoneme_elems, synthesize, synthesize_batch
    from grail_tpu.oracle import gold_dsp_chain
    from grail_tpu.utils import sample_error_db, spectral_error_db
    from grail_tpu.voices import get_spec, get_voice

    spec = get_spec(args.voice)   # registry: works for variants too
    language = lang_mod.get_language(args.language)
    voice = get_voice(args.voice)
    rate = args.rate or None
    if rate and float(rate) != float(spec.sample_rate):
        spec = dataclasses.replace(spec, sample_rate=float(rate))
        voice = voice.resampled(float(rate))

    # the production frontend's element stream through the reference DSP
    # chain — gates stub AND contour intonation, any rate
    pelems = text_to_phoneme_elems(args.text, voice, language,
                                   contour=args.contour)

    # The sequential NumPy oracle is platform-independent and dominates
    # long-form config cost (~8 min per 60 s of audio) — cache it on disk
    # keyed on the full DSP-chain input so a CPU pre-warm pays it once and
    # the TPU capture window only measures device paths.
    import hashlib

    key_parts = [f"{p.phoneme.value}:{p.length!r}:{p.blend_length!r}:"
                 f"{p.frequency!r}" for p in pelems]
    key_parts.append(repr(spec))
    key = hashlib.sha256("|".join(key_parts).encode()).hexdigest()[:24]
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".oracle_cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache_file = os.path.join(cache_dir, key + ".npy")
    if os.path.exists(cache_file):
        gold = np.load(cache_file)
    else:
        # native C++ twin when built (bit-identical, ~1000x the NumPy
        # oracle's speed — tests/test_native_oracle.py pins the equality),
        # NumPy fallback otherwise
        gold = gold_dsp_chain(pelems, spec)
        np.save(cache_file, gold)
    if args.gold_only:
        print(json.dumps({"bench": "fidelity", "gold_cached": key,
                          "seconds": round(len(gold) / float(spec.sample_rate), 1),
                          "label": args.label}), flush=True)
        return

    def _stream_read(n):
        """StreamSession product path: block-by-block session reads (xla
        stream core + the exact f32 carrier carried in SynthState.phase)."""
        from grail_tpu.runtime.stream import StreamSession

        s = StreamSession(voice=voice, language=args.language, seed=0,
                          block=4096, contour=args.contour)
        s.feed(args.text)
        s.flush()
        return s.read(n)

    def _pool_read(n, backend):
        """StreamPool serve path: the fused tick in 'carry' mode — the
        in-kernel f32 jitter AND carrier recurrences from carried state."""
        from grail_tpu.runtime.stream import StreamPool

        pool = StreamPool(2, voice=voice, language=args.language,
                          block=4096, seeds=[0, 1], contour=args.contour,
                          backend=backend)
        pool.feed(0, args.text)
        pool.flush(0)
        blocks = []
        k = 8   # read-ahead: one device dispatch per k blocks
        for _ in range((n + k * 4096 - 1) // (k * 4096)):
            blocks.append(np.asarray(pool.read_blocks(k)[0]))
        return np.concatenate(blocks)[:n]

    kw = dict(voice=args.voice, language=args.language,
              contour=args.contour, sample_rate=rate)
    cases = {
        "scan": lambda: synthesize(args.text, use_scan=True, **kw),
        # pinned: the XLA associative-scan block core (synthesize() without
        # a backend now routes to the fused split path on TPU — VERDICT r2
        # weak #2 — so the xla row must ask for it explicitly)
        "xla_block": lambda: synthesize(args.text, backend="xla", **kw),
        # round-1 streaming-kernel backend: demoted to a historical
        # baseline (docs/PARITY.md "Backend status") — no production route
        # selects it; the CPU interpret row stays as its regression pin,
        # the TPU artifact matrix covers shipped backends only
        **({} if args.tpu else {
            "pallas_interpret": lambda: synthesize_batch(
                [args.text], **kw, backend="pallas_interpret")[0]}),
        "fused" if args.tpu else "fused_interpret":
            lambda: synthesize_batch(
                [args.text], **kw,
                backend="fused" if args.tpu else "fused_interpret")[0],
        # the B=1 call above exercises the split path (S up to 128); also
        # pin the unsplit fused kernel via a multi-lane batch (round 5:
        # long utterances auto-engage the in-kernel exact f32 carrier).
        # Long-form uses 8 lanes: the kernel is lane-padded to 128 either
        # way (identical program), but only the 8 real rows are fetched —
        # 128 real rows of a 90 s batch would pull ~2 GB through the tunnel
        "fused_unsplit" if args.tpu else "fused_unsplit_interpret":
            lambda: synthesize_batch(
                [args.text] * (reps := 8 if len(gold) > 60 * 44100
                               else 128), seeds=[0] * reps, **kw,
                backend="fused" if args.tpu else "fused_interpret")[0],
        # streaming product paths (round-5 VERDICT asks: long-form rows for
        # the session and serve-mode ticks, vs the oracle — not vs batch)
        "stream": lambda: _stream_read(len(gold)),
        "stream_pool" if args.tpu else "stream_pool_interpret":
            lambda: _pool_read(len(gold),
                               "fused" if args.tpu else "fused_interpret"),
    }
    if args.tpu:
        # what a plain synthesize()/CLI call actually runs on TPU (the
        # production default: fused kernel, B=1 overlap-save lane split)
        cases["solo_default"] = lambda: synthesize(args.text, **kw)
    for name, fn in cases.items():
        if args.paths is not None and name not in args.paths:
            continue
        audio = fn()
        rec = {
            "bench": "fidelity",
            "path": name,
            "text": (args.text if len(args.text) <= 48
                     else args.text[:45] + "..."),
            "voice": args.voice,
            "language": args.language,
            "spectral_error_db": round(spectral_error_db(audio, gold), 2),
            "sample_error_db": round(sample_error_db(audio, gold), 2),
            "pass_minus60": spectral_error_db(audio, gold) < -60,
        }
        if args.label:
            rec["config"] = args.label
        if args.contour:
            rec["contour"] = True
        if rate:
            rec["rate_hz"] = rate
        if len(gold) > 10 * float(spec.sample_rate):
            rec["seconds"] = round(len(gold) / float(spec.sample_rate), 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
