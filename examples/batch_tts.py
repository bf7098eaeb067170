#!/usr/bin/env python3
"""Batched text-to-speech: many utterances in ONE device program.

The grail-rs CLI synthesizes one utterance per process
(/root/reference/examples/cli.rs); on TPU the economical unit is a batch —
every utterance runs in its own kernel lane, so 64 utterances cost barely
more wall-clock than one. Mixed voices and languages are fine.

    python examples/batch_tts.py outdir/          # default accelerator
    python examples/batch_tts.py --cpu outdir/    # force host CPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:                # the env var alone is not enough on
    sys.argv.remove("--cpu")           # platforms with plugin backends
    import jax

    jax.config.update("jax_platforms", "cpu")

from grail_tpu.api import synthesize_batch            # noqa: E402
from grail_tpu.runtime.wav import save_wav            # noqa: E402


def main(outdir: str = "/tmp/batch_tts") -> int:
    texts = [
        "hello world",
        "the quick brown fox jumps over the lazy dog",
        "speech synthesis at scale",
        "guten tag",
    ]
    voices = ["plain", "bright", "deep", "plain"]
    languages = ["english", "english", "english", "deutsch"]

    waves = synthesize_batch(texts, voice=voices, language=languages,
                             seeds=list(range(len(texts))))

    os.makedirs(outdir, exist_ok=True)
    for i, (t, audio) in enumerate(zip(texts, waves)):
        path = os.path.join(outdir, f"utt{i:02d}.wav")
        save_wav(path, audio, 44100)
        print(f"{path}: {len(audio) / 44100.0:.2f}s  \"{t}\"")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
