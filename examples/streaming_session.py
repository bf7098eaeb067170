#!/usr/bin/env python3
"""Live streaming with inline commands — the grail-rs interactive example
(/root/reference/examples/interactive.rs) as a library user would write it.

Feed text incrementally (chunks may split anywhere, even inside a
[command]); read audio in blocks on your own schedule; checkpoint and
resume bit-exactly.

    python examples/streaming_session.py out.wav          # accelerator
    python examples/streaming_session.py --cpu out.wav    # force host CPU
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:                # the env var alone is not enough on
    sys.argv.remove("--cpu")           # platforms with plugin backends
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402

from grail_tpu.runtime.stream import StreamSession     # noqa: E402
from grail_tpu.runtime.wav import save_wav             # noqa: E402


def main(out: str = "/tmp/stream.wav") -> int:
    s = StreamSession(voice="plain", language="english", block=1024)

    # chunked feeding: the transcriber and the command parser both buffer
    # partial input, so network-style chunk boundaries are safe
    for chunk in ["hello [pit", "ch:160] there, ", "how are you today"]:
        s.feed(chunk, parse_commands=True)
    s.flush()

    # drain what's pending (reading past it would keep producing idle
    # silence — a live session never "ends", like the reference REPL)
    pending = int(s.pending_seconds * 44100)
    blocks = [s.read(pending)]

    # checkpoint mid-stream, keep reading, then resume the checkpoint in a
    # NEW session: both continuations are bit-identical
    s.feed(" and goodbye")
    s.flush()
    ckpt = s.save_state()
    cont_a = s.read(44100)

    s2 = StreamSession(voice="plain", language="english", block=1024)
    s2.load_state(ckpt)
    cont_b = s2.read(44100)
    assert np.array_equal(cont_a, cont_b), "checkpoint resume must be exact"

    audio = np.concatenate(blocks + [cont_a])
    save_wav(out, audio, 44100)
    print(f"{out}: {len(audio) / 44100.0:.2f}s (checkpoint resume verified)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
