#!/usr/bin/env python3
"""Real-time pull contract: a paced audio-sink consumer driving a session.

The reference's interactive example hands the pipeline to cpal's audio
callback, which pulls samples on a hard real-time schedule
(/root/reference/examples/interactive.rs:41-70). Headless, we reproduce the
CONTRACT rather than the device: a consumer pulls one block every
block/sample_rate seconds on a deadline schedule while text is fed
concurrently, and we count deadline misses (an audio sink would underrun on
each miss).

Runs the host pipeline on CPU by default (the real-time sink sits next to
the host; the axon TPU tunnel adds a fixed ~30 ms per fetch that a local
production runtime would not). JSON line output.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pool_deadline(args):
    """Strict-deadline POOL serving (VERDICT r2 #1): N sessions, depth-2
    pipelined ticks (StreamPool.tick_pipelined — dispatch tick k+1 while
    tick k's async device->host copy drains), measured against hard
    per-block deadlines with NO read-ahead. Queue depth is structurally 2:
    exactly one extra block of sink latency vs a synchronous tick.

    Schedule: call k fires at t0 + k*period, dispatches tick k, and
    returns tick k-1's audio, which a sink plays in the window starting at
    t0 + (k+1)*period — so the fetch completing after that is a deadline
    miss (an audio underrun). Text is fed live every few ticks, as in
    production serving. Reports one JSON line per block size."""
    import time

    import numpy as np

    from grail_tpu.runtime.stream import StreamPool

    sr = 44100.0
    n = args.pool
    rng = np.random.default_rng(0)
    texts = ["hello world ", "synthesis at scale ", "grail on tpu ",
             "formants forever "]
    # CPU = the LOCAL-dispatch measurement (the XLA associative-scan core
    # compiled for host): dispatch and fetch cost microseconds, so this is
    # what any local-attached runtime sees. TPU through the axon tunnel
    # adds a measured ~33 ms RPC + ~30 MB/s transfer per fetch (see
    # SERVING_r03 notes) that no local runtime pays.
    backend = "fused" if args.tpu else "xla"
    for block in args.pool_blocks:
        period = block / sr
        pool = StreamPool(n, voice="plain", language="english", block=block,
                          backend=backend,
                          output="pcm16" if args.tpu else "f32",
                          pin_elems=args.pin_elems)
        # live-feed cadence sized so injected audio (~6 s per feed) stays
        # within the pool's realtime capacity — overfeeding just measures
        # backlog growth, not serving
        feed_every = max(7, int(np.ceil(12.0 / (n * period))))
        for i in range(n):
            pool.feed(i, texts[i % len(texts)])
            pool.flush(i)
        # warm: visit every (E, cells) jit bucket the timed loop could see
        # (a deployed sink AOT-warms the same way — compilation is never
        # real-time work). Feeds run DENSER than the timed cadence so the
        # warm pass reaches strictly higher element-count buckets than any
        # timed tick will.
        for k in range(200):
            if k % 10 == 0:
                i = int(rng.integers(0, n))
                pool.feed(i, texts[int(rng.integers(0, len(texts)))])
                pool.flush(i)
            _ = pool.tick_pipelined()
        for _k in range(int(8.0 / period)):   # drain the warm backlog
            _ = pool.tick_pipelined()
        _ = pool.drain()

        # Timed loop — producer/sink split, the real serving architecture:
        # the paced PRODUCER dispatches tick k at t0+k*period (enqueue is
        # ~3 ms; the device computes in ~1.4 ms) and hands the device
        # array to the SINK THREAD, which fetches blocks in order and
        # timestamps arrival. Tick k's audio is due at t0+(k+2)*period
        # (depth-2 schedule: one block of pipeline latency); arriving
        # later is a deadline miss (= sink underrun). No read-ahead: every
        # tick's text can be fed right up to its dispatch. Queue depth is
        # reported — sustained > 2 means the link cannot carry the audio
        # in realtime at all (bandwidth, not latency).
        use_thread = args.tpu   # local backends fetch in-loop (microseconds)
        if use_thread:
            import queue as _queue
            import threading

            inq = _queue.Queue()
        avails = {}

        # The tunnel's fetch RTT (~30 ms) exceeds the 23 ms block period, so
        # ONE serialized fetcher can never sustain realtime regardless of
        # pipeline depth. The depth-2 window is 2 periods, so the sink runs
        # `--sink-workers` (default 2) concurrent in-order fetchers — the
        # number of fetches in flight is bounded by the worker count, which
        # keeps the queue-depth/latency contract: tick k's audio still lands
        # within the same 2-period window, the RTTs just overlap. (A
        # local-attached runtime fetches in microseconds and needs one.)
        def sink_loop():
            while True:
                item = inq.get()
                if item is None:
                    return
                kk, dev = item
                a = np.asarray(dev)
                avails[kk] = time.perf_counter()
                assert a.shape == (n, block)
                with inflight_lock:
                    inflight[0] -= 1

        if use_thread:
            inflight = [0]
            inflight_lock = threading.Lock()
            workers = [threading.Thread(target=sink_loop, daemon=True)
                       for _ in range(args.sink_workers)]
            for th in workers:
                th.start()

        import gc

        gc.collect()
        gc.disable()    # a real-time audio loop does not take GC pauses
        try:
            # a real audio server runs under the RT scheduler (SCHED_FIFO),
            # exactly like jackd/pipewire's processing threads
            os.sched_setscheduler(
                0, os.SCHED_FIFO, os.sched_param(10))
        except (AttributeError, OSError, PermissionError):
            try:
                os.nice(-10)
            except (OSError, PermissionError):
                pass
        dispatches = []
        max_outstanding = 2
        t0 = time.perf_counter() + period
        for k in range(args.ticks):
            target = t0 + k * period
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
            if k % feed_every == 0:
                i = int(rng.integers(0, n))
                pool.feed(i, texts[int(rng.integers(0, len(texts)))])
                pool.flush(i)
            td = time.perf_counter()
            if use_thread:
                out = pool.read_block(sync=False)
                try:
                    out.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
                dispatches.append(time.perf_counter() - td)
                with inflight_lock:
                    inflight[0] += 1
                    max_outstanding = max(max_outstanding, inflight[0])
                inq.put((k, out))
            else:
                # depth-2 in-loop: collect tick k-1 (its copy had a full
                # period to drain), then dispatch tick k
                audio = pool.collect()
                if audio is not None:
                    avails[k - 1] = time.perf_counter()
                pool.dispatch_tick()
                dispatches.append(time.perf_counter() - td)
        if use_thread:
            for _ in workers:
                inq.put(None)
            for th in workers:
                th.join(timeout=120)
        else:
            audio = pool.drain()
            if audio is not None:
                avails[args.ticks - 1] = time.perf_counter()
        gc.enable()

        end = time.perf_counter() + 1e3   # unfetched tick: count as missed
        lat = np.array([avails.get(k, end) - (t0 + k * period)
                        for k in range(args.ticks)])
        late = np.array([avails.get(k, end) - (t0 + (k + 2) * period)
                         for k in range(args.ticks)])
        misses = int(np.sum(late > 0))
        # same timestamps against a 3-period sink buffer (one more block of
        # latency — the cpal/pipewire default is 2-3 periods): separates
        # misses caused by serving from host-OS scheduling stalls
        late3 = np.array([avails.get(k, end) - (t0 + (k + 3) * period)
                          for k in range(args.ticks)])
        dms = np.asarray(dispatches) * 1e3
        print(json.dumps({
            "bench": "serving_deadline",
            "sessions": n,
            "block": block,
            "backend": backend,
            "output": pool.output,
            "period_ms": round(period * 1e3, 2),
            "ticks": args.ticks,
            "pipeline_depth": 2,
            "added_latency_blocks": 1,
            "deadline_misses": misses,
            "miss_rate": round(misses / args.ticks, 5),
            "deadline_misses_depth3": int(np.sum(late3 > 0)),
            "worst_late_ms": round(float(late.max()) * 1e3, 2),
            "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
            "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
            "latency_max_ms": round(float(lat.max()) * 1e3, 2),
            "dispatch_p50_ms": round(float(np.percentile(dms, 50)), 2),
            "dispatch_p99_ms": round(float(np.percentile(dms, 99)), 2),
            "max_queue_depth": max_outstanding,
            "realtime_ok": misses == 0,
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--pool", type=int, default=0, metavar="N",
                    help="strict-deadline POOL mode: N depth-2 pipelined "
                         "sessions against hard per-block deadlines")
    ap.add_argument("--pool-blocks", type=int, nargs="*",
                    default=[1024, 2048, 4096])
    ap.add_argument("--ticks", type=int, default=2000)
    ap.add_argument("--pin-elems", type=int, default=64,
                    help="pin the pool's element bucket (jit-shape "
                         "stability: a mid-serving E-bucket change is a "
                         "multi-second recompile stall)")
    ap.add_argument("--sink-workers", type=int, default=2,
                    help="concurrent sink fetchers (TPU tunnel: the ~30 ms "
                         "fetch RTT must overlap to sustain a <30 ms period; "
                         "bounded by the depth-2 window = 2 periods)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(".jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_cache"))

    if args.pool:
        pool_deadline(args)
        return

    from grail_tpu.runtime.stream import StreamSession

    sr = 44100.0
    period = args.block / sr
    n_blocks = int(args.seconds / period)

    def scenario(timed: bool):
        """One scripted run; the first (untimed) pass visits every jit shape
        bucket the timed pass will need — a deployed sink would AOT-warm the
        same way, since compilation is never real-time work."""
        s = StreamSession(voice="plain", language="english", block=args.block)
        s.feed("hello there, this is a live latency test. ")
        _ = s.read(args.block)
        t0 = time.perf_counter()
        misses = 0
        worst = 0.0
        pulls = []
        for i in range(n_blocks):
            deadline = t0 + (i + 1) * period
            tp = time.perf_counter()
            _ = s.read(args.block)          # the sink's pull
            pulls.append(time.perf_counter() - tp)
            late = time.perf_counter() - deadline
            worst = max(worst, late)
            if late > 0:
                misses += 1
            else:
                time.sleep(-late)
            if i == n_blocks // 2:
                s.feed("more text injected live. ")   # mid-stream feed
        return misses, worst, pulls

    scenario(timed=False)                    # compile every shape bucket
    misses, worst, pulls = scenario(timed=True)

    print(json.dumps({
        "bench": "latency",
        "block": args.block,
        "period_ms": round(period * 1e3, 2),
        "blocks": n_blocks,
        "deadline_misses": misses,
        "worst_late_ms": round(worst * 1e3, 2),
        "pull_p50_ms": round(sorted(pulls)[len(pulls) // 2] * 1e3, 2),
        "pull_max_ms": round(max(pulls) * 1e3, 2),
        "realtime_ok": misses == 0,
    }))


if __name__ == "__main__":
    main()
