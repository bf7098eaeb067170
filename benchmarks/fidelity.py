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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--text", default="aeae")
    ap.add_argument("--voice", default="generic",
                    help="voice preset for both oracle and fast paths")
    ap.add_argument("--language", default="generic")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from grail_tpu import languages as lang_mod
    from grail_tpu.api import synthesize, synthesize_batch
    from grail_tpu.oracle import oracle_pipeline
    from grail_tpu.utils import sample_error_db, spectral_error_db
    from grail_tpu.voices import get_spec

    spec = get_spec(args.voice)   # registry: works for variants too
    language = lang_mod.get_language(args.language)

    gold = oracle_pipeline(args.text, spec, language)

    kw = dict(voice=args.voice, language=args.language)
    cases = {
        "scan": lambda: synthesize(args.text, use_scan=True, **kw),
        "xla_block": lambda: synthesize(args.text, **kw),
        "pallas" if args.tpu else "pallas_interpret":
            lambda: synthesize_batch(
                [args.text], **kw,
                backend="pallas" if args.tpu else "pallas_interpret")[0],
        "fused" if args.tpu else "fused_interpret":
            lambda: synthesize_batch(
                [args.text], **kw,
                backend="fused" if args.tpu else "fused_interpret")[0],
        # the B=1 call above exercises the split path (S up to 128); also
        # pin the unsplit fused kernel via a 128-lane batch
        "fused_unsplit" if args.tpu else "fused_unsplit_interpret":
            lambda: synthesize_batch(
                [args.text] * 128, seeds=[0] * 128, **kw,
                backend="fused" if args.tpu else "fused_interpret")[0],
    }
    for name, fn in cases.items():
        audio = fn()
        print(json.dumps({
            "bench": "fidelity",
            "path": name,
            "text": args.text,
            "voice": args.voice,
            "language": args.language,
            "spectral_error_db": round(spectral_error_db(audio, gold), 2),
            "sample_error_db": round(sample_error_db(audio, gold), 2),
            "pass_minus60": spectral_error_db(audio, gold) < -60,
        }), flush=True)


if __name__ == "__main__":
    main()
