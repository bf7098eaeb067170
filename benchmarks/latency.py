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
    backend = "fused" if args.tpu else "fused_interpret"
    for block in args.pool_blocks:
        period = block / sr
        pool = StreamPool(n, voice="plain", language="english", block=block,
                          backend=backend)
        for i in range(n):
            pool.feed(i, texts[i % len(texts)])
            pool.flush(i)
        # warm: visit every (E, cells) jit bucket the timed loop will see
        # (a deployed sink AOT-warms the same way — compilation is never
        # real-time work); same feed cadence as the timed loop
        for k in range(100):
            if k % 7 == 0:
                i = int(rng.integers(0, n))
                pool.feed(i, texts[int(rng.integers(0, len(texts)))])
                pool.flush(i)
            _ = pool.tick_pipelined()
        _ = pool.drain()

        # Timed loop. Schedule: call k fires at t0+k*period, COLLECTS tick
        # k-1 (whose async device->host copy was started a full period ago
        # at its dispatch — the transfer latency hides inside the previous
        # sleep), then dispatches tick k. Tick k-1's audio is due at
        # target+period (the sink plays it in the window starting there);
        # a collect completing later is a deadline miss (= underrun).
        # Non-cascading accounting: after a miss the schedule re-anchors —
        # a real sink underruns once and resumes, it does not count every
        # subsequent block as missed for the rest of the run.
        misses = 0
        worst = -1e9
        collects, dispatches = [], []
        t0 = time.perf_counter() + period
        k = 0
        for _tick in range(args.ticks):
            target = t0 + k * period
            now = time.perf_counter()
            if now < target:
                time.sleep(target - now)
            elif now - target > period:       # fell behind: re-anchor
                t0 += now - target
                target = now
            if k % 7 == 0:
                i = int(rng.integers(0, n))
                pool.feed(i, texts[int(rng.integers(0, len(texts)))])
                pool.flush(i)
            tp = time.perf_counter()
            audio = pool.collect()            # tick k-1's audio
            avail = time.perf_counter()
            pool.dispatch_tick()              # tick k (producer work; not
            dispatches.append(time.perf_counter() - avail)   # on sink path)
            collects.append(avail - tp)
            if audio is not None:
                assert audio.shape == (n, block)
                late = avail - (target + period)
                worst = max(worst, late)
                if late > 0:
                    misses += 1
            k += 1
        _ = pool.drain()
        cms = np.asarray(collects[1:]) * 1e3
        dms = np.asarray(dispatches) * 1e3
        print(json.dumps({
            "bench": "serving_deadline",
            "sessions": n,
            "block": block,
            "backend": backend,
            "period_ms": round(period * 1e3, 2),
            "ticks": args.ticks,
            "pipeline_depth": 2,
            "added_latency_blocks": 1,
            "deadline_misses": misses,
            "miss_rate": round(misses / max(args.ticks - 1, 1), 5),
            "worst_late_ms": round(worst * 1e3, 2),
            "collect_p50_ms": round(float(np.percentile(cms, 50)), 2),
            "collect_p99_ms": round(float(np.percentile(cms, 99)), 2),
            "collect_max_ms": round(float(cms.max()), 2),
            "dispatch_p50_ms": round(float(np.percentile(dms, 50)), 2),
            "dispatch_p99_ms": round(float(np.percentile(dms, 99)), 2),
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
