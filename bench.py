#!/usr/bin/env python3
"""Benchmark: aggregate synthesis throughput (x realtime) at 64-way batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): >= 1000x realtime aggregate on one v5e chip
at 64-way voice/utterance batch -> vs_baseline = value / 1000.

The reference publishes no numbers; its CLI self-times the same quantity
(seconds-of-audio vs generation wall-time, examples/cli.rs:186-193).

NOTE: on the axon platform block_until_ready() does not synchronize, so the
timing loop forces a scalar device->host fetch per iteration.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import os

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from grail_tpu.api import (_round_up, _score_num_samples, _synth_jit_batch,
                               default_backend, text_to_score)
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.kernel import LANE
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice

    from grail_tpu.api import _synth_jit_split

    B = 64
    texts = [("aeae" * 4)[: 8 + (i % 8)] for i in range(B)]  # ~4-8 s each
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    backend = default_backend()
    S = 2 if backend == "pallas" else 1  # overlap-save split -> 128 lanes

    E = max(text_to_score(t).num_elems for t in texts)
    Bp = B if S > 1 else (_round_up(B, LANE) if backend.startswith("pallas") else B)
    scores = [text_to_score(texts[i % B], pad_to=E) for i in range(Bp)]
    Ns = [_score_num_samples(s, sr) for s in scores[:B]]
    T = _round_up(max(Ns), S * 4096)

    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(Bp)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = jax.device_put(stack_scores(scores))
    lattices = jax.device_put(lattices)
    jparams = (jnp.float32(voice.jitter_frequency),
               jnp.float32(voice.jitter_delta_frequency),
               jnp.float32(voice.jitter_delta_formant_frequency),
               jnp.float32(voice.jitter_delta_amplitude))
    srj = jnp.float32(sr)

    def run():
        if S > 1:
            return _synth_jit_split(batched, lattices, jparams, srj, T, S)
        return _synth_jit_batch(batched, lattices, jparams, srj, T, backend)

    out = run()
    _ = float(np.asarray(out[0, 0]))  # compile + real sync

    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = run()
        _ = float(np.asarray(out[0, 0]))  # forces the full computation
        times.append(time.perf_counter() - t0)
    wall = min(times)

    audio_seconds = sum(Ns) / sr  # the 64 real utterances
    realtime = audio_seconds / wall

    print(json.dumps({
        "metric": "aggregate_synthesis_throughput_64batch",
        "value": round(realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime / 1000.0, 3),
    }))


if __name__ == "__main__":
    main()
