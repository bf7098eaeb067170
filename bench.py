#!/usr/bin/env python3
"""Benchmark: aggregate synthesis throughput (x realtime) at 64-way batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.json): >= 1000x realtime aggregate on one v5e chip
at 64-way voice/utterance batch -> vs_baseline = value / 1000.

Timing methodology (see docs/ROOFLINE.md): on the axon platform
block_until_ready() does not synchronize AND a scalar device->host fetch
costs a fixed ~30 ms tunnel round trip regardless of work (an empty kernel
and a resident-array fetch measure the same). The headline is therefore the
AMORTIZED device time: K back-to-back dispatches (they serialize on the
device), one fetch, t = (wall_K - wall_1) / (K - 1). The one-shot wall
(round-1 methodology) and the measured fixed overhead are reported
alongside, with the full kernel geometry, so rounds stay comparable.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

HBM_BW_V5E = 819e9          # bytes/s, TPU v5e peak HBM bandwidth
AMORTIZE_K = 8


def main(force_cpu: bool = False):
    import os

    import jax

    if force_cpu:
        # last-resort fallback when the axon tunnel is unreachable: the env
        # var alone is ignored by the axon plugin, the config knob works
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from grail_tpu.api import (WARMUP, _round_up, _score_num_samples,
                               _split_sched, _synth_jit_batch,
                               _synth_jit_split_fused, default_backend,
                               text_to_score)
    from grail_tpu.synth.schedule import device_window
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.kernel_fused import CHUNK_F, CHUNK_PRE, LANE_F
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice

    B = 64
    texts = [("aeae" * 4)[: 8 + (i % 8)] for i in range(B)]  # ~4-8 s each
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    backend = default_backend()
    S = 2 if backend == "fused" else 1  # overlap-save split -> 128 lanes

    E = max(text_to_score(t).num_elems for t in texts)
    scores = [text_to_score(t, pad_to=E) for t in texts]
    Ns = [_score_num_samples(s, sr) for s in scores]
    T = _round_up(max(Ns), max(S, 1) * 4096)

    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(B)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = jax.device_put(stack_scores(scores))
    lattices = jax.device_put(lattices)
    jparams = (jnp.float32(voice.jitter_frequency),
               jnp.float32(voice.jitter_delta_frequency),
               jnp.float32(voice.jitter_delta_formant_frequency),
               jnp.float32(voice.jitter_delta_amplitude))
    srj = jnp.float32(sr)

    inc = float(voice.jitter_frequency)
    if S > 1:
        sched_pre, sched_seg, lat_shift = _split_sched(inc, T, S)
    else:
        sched = device_window(inc, 0, T)

    def run():
        if S > 1:
            return _synth_jit_split_fused(batched, lattices, jparams, srj,
                                          sched_pre, sched_seg, lat_shift,
                                          T, S)
        return _synth_jit_batch(batched, lattices, jparams, srj, sched,
                                T, backend)

    out = run()
    _ = float(np.asarray(out[0, 0]))  # compile + real sync

    def timed(k):
        t0 = time.perf_counter()
        o = None
        for _i in range(k):
            o = run()
        _ = float(np.asarray(o[0, 0]))  # forces the full computation
        return time.perf_counter() - t0

    if force_cpu:
        # no tunnel: dispatch/fetch are synchronous and honest, and one run
        # is ~100 s — time a single run instead of the amortization ladder
        wall_1 = timed(1)
        device_wall = wall_1
        fixed_overhead = 0.0
    else:
        wall_1 = min(timed(1) for _ in range(6))
        wall_k = min(timed(AMORTIZE_K) for _ in range(4))
        device_wall = (wall_k - wall_1) / (AMORTIZE_K - 1)
        if device_wall <= 0:
            # pathological tunnel jitter (every 1-run fetch slower than the
            # K-run total): fall back to the conservative upper bound
            device_wall = wall_k / AMORTIZE_K
        fixed_overhead = wall_1 - device_wall

    audio_seconds = sum(Ns) / sr  # the 64 real utterances
    realtime = audio_seconds / device_wall
    samples_per_sec = sum(Ns) / device_wall

    # HBM traffic model for the fused path (docs/ROOFLINE.md): the kernel's
    # only per-sample traffic is the audio block write; the XLA epilogue
    # reads it once and writes the reassembled [B, T]. Tables are O(E+W).
    lanes = S * B
    Text = T // S + (WARMUP if S > 1 else 0)
    bytes_audio = lanes * Text * 4 * 2 + B * T * 4
    hbm_util = bytes_audio / device_wall / HBM_BW_V5E

    extra = {}
    if force_cpu:
        extra["platform"] = "cpu_fallback"
        extra["note"] = ("TPU tunnel unreachable at measurement time; this "
                         "is a host-CPU measurement of the same program. "
                         "TPU-measured headline: BENCH_r04.json (23034.8x)")
    print(json.dumps({
        "metric": "aggregate_synthesis_throughput_64batch",
        "value": round(realtime, 1),
        "unit": "x_realtime",
        "vs_baseline": round(realtime / 1000.0, 3),
        **extra,
        # -- methodology + geometry (round-over-round comparability) --
        "device_wall_ms": round(device_wall * 1e3, 2),
        "oneshot_wall_ms": round(wall_1 * 1e3, 2),
        "oneshot_x_realtime": round(audio_seconds / wall_1, 1),
        "fixed_sync_overhead_ms": round(fixed_overhead * 1e3, 2),
        "amortize_k": AMORTIZE_K,
        "backend": backend,
        "geometry": {"B": B, "S": S, "T": T, "E": E, "lane": LANE_F,
                     "chunk": CHUNK_F, "chunk_pre": CHUNK_PRE,
                     "warmup": WARMUP},
        # -- hardware utilization --
        "samples_per_sec_chip": round(samples_per_sec),
        "hbm_bytes_per_run": bytes_audio,
        "hbm_bw_utilization": round(hbm_util, 4),
        "bound": "VPU throughput on vectorized prep (not HBM): docs/ROOFLINE.md",
    }))


def watchdog():
    """Run the measurement in a child process with a hang watchdog.

    The axon tunnel occasionally hangs for minutes at client init or
    mid-compile (docs/SERVING.md: "tunnel health variance"); a hung
    jax.devices() blocks in C++ and cannot be recovered in-process. The
    parent retries a fresh child up to 3 times, bounding a hang to one
    watchdog window instead of the caller's whole budget."""
    import os
    import subprocess

    # two TPU attempts, then a host-CPU fallback measurement (annotated in
    # the JSON) — a dead axon tunnel must not leave the round with NO
    # recorded benchmark at all (docs/SERVING.md: multi-hour outages happen)
    deadline = [(480, False), (600, False), (900, True)]
    for attempt, (limit, cpu) in enumerate(deadline):
        try:
            argv = [sys.executable, os.path.abspath(__file__), "--child"]
            if cpu:
                argv.append("--cpu")
            r = subprocess.run(
                argv, timeout=limit, stdout=subprocess.PIPE,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
        except subprocess.TimeoutExpired:
            print(f"bench: attempt {attempt + 1} hung >{limit}s "
                  f"(tunnel stall), retrying", file=sys.stderr, flush=True)
            continue
        out = r.stdout.decode()
        if r.returncode == 0 and '"metric"' in out:
            sys.stdout.write(out)
            return 0
        print(f"bench: attempt {attempt + 1} failed rc={r.returncode}",
              file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if "--child" not in sys.argv:
        sys.exit(watchdog())
    main(force_cpu="--cpu" in sys.argv)
