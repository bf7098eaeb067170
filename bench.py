#!/usr/bin/env python3
"""Benchmark: aggregate synthesis throughput (x realtime) at 64-way batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 1000x realtime aggregate on one v5e chip
at 64-way voice/utterance batch -> vs_baseline = value / 1000.

The reference publishes no numbers; its CLI self-times the same quantity
(seconds-of-audio vs generation wall-time, examples/cli.rs:186-193).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax

    from grail_tpu.api import _round_up, _score_num_samples, _synth_jit_batch, text_to_score
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice
    import jax.numpy as jnp

    B = 64
    texts = [("aeae" * 4)[: 8 + (i % 8)] for i in range(B)]  # ~4-8 s each
    voice = get_voice("generic")
    sr = float(voice.sample_rate)

    scores_raw = [text_to_score(t) for t in texts]
    E = max(s.num_elems for s in scores_raw)
    scores = [text_to_score(t, pad_to=E) for t in texts]
    Ns = [_score_num_samples(s, sr) for s in scores]
    T = _round_up(max(Ns), 4096)

    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(B)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = stack_scores(scores)
    jparams = (jnp.float32(voice.jitter_frequency),
               jnp.float32(voice.jitter_delta_frequency),
               jnp.float32(voice.jitter_delta_formant_frequency),
               jnp.float32(voice.jitter_delta_amplitude))
    srj = jnp.float32(sr)

    # device-resident inputs
    batched = jax.device_put(batched)
    lattices = jax.device_put(lattices)

    out = _synth_jit_batch(batched, lattices, jparams, srj, T, False)
    out.block_until_ready()  # compile + warm

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _synth_jit_batch(batched, lattices, jparams, srj, T, False)
    out.block_until_ready()
    wall = (time.perf_counter() - t0) / iters

    audio_seconds = sum(Ns) / sr
    realtime = audio_seconds / wall

    print(json.dumps({
        "metric": "aggregate_synthesis_throughput_64batch",
        "value": round(realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
