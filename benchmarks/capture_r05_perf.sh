#!/bin/bash
# Round-5 perf capture: serving (deadline + tick + attribution incl. the
# new N=512 row), throughput (incl. the in-kernel exact-carrier overhead
# A/B), VPU peak microbenchmark, cli_solo, and the CPU-LOCAL strict-deadline
# rows (VERDICT r4 next #4 — measured locally-attached numbers, no tunnel).
# Serialized: ONE axon client at a time; run AFTER the fidelity capture and
# with no other load (single-core host — deadline rows are timing-sensitive).
# Artifacts re-assembled after EVERY step from per-step files.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r05
mkdir -p "$LOG"
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

assemble_all() {
  local f ok
  ok=0
  for f in "$LOG/serving_pool.json" "$LOG/serving_local.json" \
           "$LOG/serving_tick.json" "$LOG/serving_attr.json"; do
    [ -s "$f" ] && ok=1
  done
  [ "$ok" = 1 ] && cat "$LOG/serving_pool.json" "$LOG/serving_local.json" \
      "$LOG/serving_tick.json" "$LOG/serving_attr.json" 2>/dev/null \
      > SERVING_r05.json
  ok=0
  for f in "$LOG/throughput.json" "$LOG/throughput_kcar.json" \
           "$LOG/throughput_attr.json" "$LOG/vpu_peak.json" \
           "$LOG/cli_solo.json"; do
    [ -s "$f" ] && ok=1
  done
  [ "$ok" = 1 ] && cat "$LOG/throughput.json" "$LOG/throughput_kcar.json" \
      "$LOG/throughput_attr.json" "$LOG/vpu_peak.json" \
      "$LOG/cli_solo.json" 2>/dev/null > THROUGHPUT_r05.json
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $(date -u +%H:%M:%S) $name =="
  timeout "$tmo" "$@" >"$LOG/$name.json" 2>"$LOG/$name.err"
  echo "   rc=$? -> $LOG/$name.json ($(wc -c <"$LOG/$name.json") bytes)"
  assemble_all
}

# short headline first: primes the fused-kernel compile cache
step bench 900 python bench.py

# strict-deadline rows; 2048 is the catch-up-batching focus block (r4's 84
# misses incl. 20 'queued' — the new concurrent-drain sink should zero the
# queued class)
step serving_pool 2400 python benchmarks/latency.py --tpu --pool 128 \
    --ticks 2000 --output ulaw --pool-blocks 2048 4096 1024
# CPU-LOCAL strict-deadline rows: the locally-attached-runtime measurement
# (no tunnel; dispatch+fetch are microseconds) — VERDICT r4 next #4
step serving_local 2400 python benchmarks/latency.py --pool 128 \
    --ticks 2000 --pool-blocks 2048 1024
# per-N aggregate rows + attribution, now through N=512 (4 lane tiles)
step serving_tick 1500 python benchmarks/serving.py --sizes 16 64 128 256 512
step serving_attr 1500 python benchmarks/serving.py --attr \
    --sizes 64 128 256 512 --ticks 128

step throughput 1500 python benchmarks/throughput.py \
    --batches 16,64,128,256,512,1024
# in-kernel exact-carrier overhead A/B (same geometry as the sweep rows)
step throughput_kcar 900 python benchmarks/throughput.py --kcar \
    --batches 128,512
step throughput_attr 1200 python benchmarks/throughput.py --attr \
    --batches 256,512
# measured VPU peak (ROOFLINE utilization accounting, VERDICT r4 next #5)
step vpu_peak 900 python benchmarks/vpu_peak.py

cat > /tmp/cli_solo_r05.py <<'EOF'
import io, json, os, re, sys
sys.path.insert(0, os.getcwd())
from contextlib import redirect_stdout
from grail_tpu.cli import main
text = os.environ.get("CLI_SOLO_TEXT",
                      "the quick brown fox jumps over the lazy dog "
                      "sounds on")                               # ~10 s
best, audio_s = None, None
for attempt in range(3):          # run 1 compiles; keep the fastest warm run
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["-s", text])
    m = re.search(r"([\d.]+) seconds of audio, generated in (\d+) micro",
                  buf.getvalue())
    if rc == 0 and m and attempt:
        x = float(m.group(1)) / (int(m.group(2)) / 1e6)
        best = max(best or 0.0, x)
        audio_s = float(m.group(1))
if best is None:
    sys.exit(1)   # a broken CLI must fail the step, not emit a plausible row
print(json.dumps({"bench": "cli_solo", "text_seconds": audio_s,
                  "x_realtime_wall": round(best, 1),
                  "note": "one-shot wall incl. ~30ms tunnel sync + host "
                          "frontend; production solo path = fused "
                          "overlap-save split"}))
EOF
step cli_solo 900 python /tmp/cli_solo_r05.py

echo "perf capture done: $(ls -la $LOG)"
