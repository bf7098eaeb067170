#!/usr/bin/env python3
"""Production serving: N concurrent sessions, one device tick, RT split.

The serving shape grail-rs cannot express: a StreamPool batches N live
sessions into one device program per audio block. serve mode splits a
dispatch-only real-time thread from a maintenance frontend thread
(docs/SERVING.md); output can be pcm16 or G.711 ulaw, and the pool
checkpoints/restores in one payload. On a TPU pod slice, pass
mesh=make_mesh(n_chips, 1) to shard sessions across chips — the same code.

    python examples/serving_pool.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:                # the env var alone is not enough on
    sys.argv.remove("--cpu")           # platforms with plugin backends
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402

from grail_tpu.runtime.stream import StreamPool        # noqa: E402


def main() -> int:
    n = 8
    pool = StreamPool(n, voice="plain", language="english", block=1024,
                      output="pcm16", pin_elems=64)
    texts = ["hello there", "synthesis at scale", "grail on tpu",
             "formants forever"]
    for i in range(n):
        pool.feed(i, texts[i % len(texts)])
        pool.flush(i)

    pool.serve_start()                 # compile-warm, spawn the frontend
    try:
        ticks = []
        for k in range(30):
            if k == 10:                # live feed mid-serving: lands one
                pool.feed(2, " more")  # frontend cycle later, disturbs
                pool.flush(2)          # no other session
            ticks.append(np.asarray(pool.serve_tick()))
    finally:
        pool.serve_stop()

    audio = np.concatenate(ticks, axis=1)      # [n, 30*1024] int16
    secs = audio.shape[1] / 44100.0
    print(f"served {n} sessions x {secs:.2f}s "
          f"({audio.dtype}, peak {np.abs(audio).max()})")

    payload = pool.save()              # one-payload pool checkpoint
    pool.load(payload)
    print(f"pool checkpoint round-trip: {len(payload)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
