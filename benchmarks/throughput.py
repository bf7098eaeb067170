#!/usr/bin/env python3
"""Throughput sweep: batch size x backend -> x-realtime (JSON lines).

Timing forces a scalar device->host fetch per iteration (block_until_ready
does not synchronize on the axon platform).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(B, backend, texts_per=8, iters=3, trace_dir=None, kcar=False):
    import jax
    import jax.numpy as jnp

    from grail_tpu.api import (_round_up, _score_num_samples, _synth_jit_batch,
                               text_to_score)
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.kernel import LANE
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice

    texts = [("aeae" * 4)[: 8 + (i % texts_per)] for i in range(B)]
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    E = max(text_to_score(t).num_elems for t in texts)
    Bp = _round_up(B, LANE) if backend.startswith(("pallas", "fused")) else B
    scores = [text_to_score(texts[i % B], pad_to=E) for i in range(Bp)]
    Ns = [_score_num_samples(s, sr) for s in scores[:B]]
    T = _round_up(max(Ns), 4096)
    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(Bp)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = jax.device_put(stack_scores(scores))
    lattices = jax.device_put(lattices)
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    srj = jnp.float32(sr)
    from grail_tpu.synth.schedule import device_window

    sched = device_window(float(voice.jitter_frequency), 0, T)

    out = _synth_jit_batch(batched, lattices, jp, srj, sched, T, backend,
                           kcar=kcar)
    _ = float(np.asarray(out[0, 0]))
    if trace_dir:
        # jax.profiler trace of one steady-state iteration; the final fetch
        # forces completion (axon's block_until_ready does not synchronize)
        with jax.profiler.trace(trace_dir):
            out = _synth_jit_batch(batched, lattices, jp, srj, sched, T,
                                   backend, kcar=kcar)
            _ = float(np.asarray(out[0, 0]))
    def timed(k):
        t0 = time.perf_counter()
        o = None
        for _i in range(k):
            o = _synth_jit_batch(batched, lattices, jp, srj, sched, T,
                                 backend, kcar=kcar)
        _ = float(np.asarray(o[0, 0]))
        return time.perf_counter() - t0

    # one-shot wall (includes the axon tunnel's fixed ~30 ms sync) and the
    # amortized device time (bench.py methodology, docs/ROOFLINE.md)
    K = 8
    wall = min(timed(1) for _ in range(max(iters, 3)))
    wall_k = min(timed(K) for _ in range(3))
    device = (wall_k - wall) / (K - 1)
    if device <= 0:   # pathological tunnel jitter: conservative upper bound
        device = wall_k / K
    audio_seconds = sum(Ns) / sr
    return {
        "bench": "throughput",
        "batch": B,
        "backend": backend,
        **({"exact_carrier": "kernel"} if kcar else {}),
        "audio_seconds": round(audio_seconds, 2),
        "wall_ms": round(wall * 1000, 2),
        "x_realtime": round(audio_seconds / wall, 1),
        "device_ms": round(device * 1000, 2),
        "x_realtime_device": round(audio_seconds / device, 1),
    }


def run_attr(B, iters=3):
    """Per-phase attribution for the fused backend (VERDICT r2 weak #3:
    B=256 weak-scaling dip): times the XLA table-build prologue and the
    pallas_call separately, plus the end-to-end program, all with the
    amortized min-of-K estimator. Phases:
      tables_ms  — build_tables alone (cumsum/transposes/lattice shifts)
      kernel_ms  — synth_fused_pallas on prebuilt tables
      full_ms    — the production _synth_jit_batch('fused') program
    """
    import functools

    import jax
    import jax.numpy as jnp

    from grail_tpu.api import (_round_up, _score_num_samples,
                               _synth_jit_batch, text_to_score)
    from grail_tpu.synth.jitter import JitterLattice, build_lattice
    from grail_tpu.synth.kernel import LANE
    from grail_tpu.synth.kernel_fused import build_tables, synth_fused_pallas
    from grail_tpu.synth.score import stack_scores
    from grail_tpu.voices import get_voice

    texts = [("aeae" * 4)[: 8 + (i % 8)] for i in range(B)]
    voice = get_voice("generic")
    sr = float(voice.sample_rate)
    E = max(text_to_score(t).num_elems for t in texts)
    Bp = _round_up(B, LANE)
    scores = [text_to_score(texts[i % B], pad_to=E) for i in range(Bp)]
    Ns = [_score_num_samples(s, sr) for s in scores[:B]]
    T = _round_up(max(Ns), 4096)
    lattices = [build_lattice(i, T, voice.jitter_frequency) for i in range(Bp)]
    lattices = JitterLattice(*(np.stack(f) for f in zip(*lattices)))
    batched = jax.device_put(stack_scores(scores))
    lattices = jax.device_put(lattices)
    jp = tuple(jnp.float32(x) for x in (
        voice.jitter_frequency, voice.jitter_delta_frequency,
        voice.jitter_delta_formant_frequency, voice.jitter_delta_amplitude))
    srj = jnp.float32(sr)

    from grail_tpu.synth.schedule import device_window

    phi_s, cell_s = device_window(float(voice.jitter_frequency), 0, T)
    sched = (phi_s, cell_s)
    sched2 = (phi_s[:, None], cell_s[:, None])

    tables_fn = jax.jit(lambda s, l: build_tables(s, l, jp, srj))
    kernel_fn = jax.jit(functools.partial(synth_fused_pallas, T=T,
                                          sched=sched2))

    tables = jax.device_put(jax.tree.map(np.asarray, tables_fn(batched, lattices)))

    def amortized(fn, sync):
        def timed(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn()
            sync(o)
            return time.perf_counter() - t0

        w1 = min(timed(1) for _ in range(max(iters, 3)))
        wk = min(timed(8) for _ in range(3))
        d = (wk - w1) / 7
        return d if d > 0 else wk / 8

    t_tab = amortized(lambda: tables_fn(batched, lattices),
                      lambda o: float(np.asarray(o.n[0, 0])))
    t_ker = amortized(lambda: kernel_fn(tables),
                      lambda o: float(np.asarray(o[0][0, 0])))
    t_full = amortized(
        lambda: _synth_jit_batch(batched, lattices, jp, srj, sched, T,
                                 "fused"),
        lambda o: float(np.asarray(o[0, 0])))
    audio_seconds = sum(Ns) / sr
    lane_tiles = Bp // LANE
    return {
        "bench": "throughput_attr",
        "batch": B,
        "lane_tiles": lane_tiles,
        "T": T,
        "audio_seconds": round(audio_seconds, 2),
        "tables_ms": round(t_tab * 1e3, 2),
        "kernel_ms": round(t_ker * 1e3, 2),
        "full_ms": round(t_full * 1e3, 2),
        "kernel_ms_per_tile": round(t_ker * 1e3 / lane_tiles, 2),
        "x_realtime_device": round(audio_seconds / t_full, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,64,128,256")
    ap.add_argument("--backends", default=None)
    ap.add_argument("--attr", action="store_true",
                    help="per-phase attribution (tables vs kernel vs full) "
                         "for the fused backend")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="write a jax.profiler trace of one iteration per "
                         "case to DIR (view with tensorboard/xprof)")
    ap.add_argument("--kcar", action="store_true",
                    help="run the fused kernel with the in-kernel exact f32 "
                         "carrier (exact_carrier='kernel') — measures the "
                         "sequential carrier loop's overhead vs Q32")
    args = ap.parse_args()

    import jax

    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from grail_tpu.api import default_backend

    if args.attr:
        for b in [int(x) for x in args.batches.split(",")]:
            print(json.dumps(run_attr(b)), flush=True)
        return

    backends = (args.backends.split(",") if args.backends
                else [default_backend()])
    for backend in backends:
        for b in [int(x) for x in args.batches.split(",")]:
            print(json.dumps(run_case(b, backend, trace_dir=args.trace,
                                      kcar=args.kcar)),
                  flush=True)


if __name__ == "__main__":
    main()
