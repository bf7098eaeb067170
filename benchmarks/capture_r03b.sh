#!/bin/bash
# Round-3 artifact capture, v2: same steps as capture_r03.sh but
#   * priority order (the driver re-runs bench.py itself at round end, so
#     the serving/fidelity/throughput artifacts come first after a short
#     cache-priming bench), and
#   * repo-root artifacts are re-assembled after EVERY step, so a capture
#     cut short by the wall clock still leaves whatever it measured.
# Serialized: ONE axon client at a time (a second concurrent client hangs).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r03
mkdir -p "$LOG"

assemble() {  # assemble <dest> <src...>  — only from non-empty sources
  local dest=$1; shift
  local ok=0
  for f in "$@"; do [ -s "$f" ] && ok=1; done
  if [ "$ok" = 1 ]; then cat "$@" 2>/dev/null > "$dest"; fi
}

assemble_all() {
  assemble SERVING_r03.json "$LOG/serving_pool.json" "$LOG/serving_tick.json"
  assemble FIDELITY_r03.json "$LOG/fidelity.json"
  assemble THROUGHPUT_r03.json "$LOG/throughput.json" \
      "$LOG/throughput_attr.json" "$LOG/cli_solo.json"
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "== $(date -u +%H:%M:%S) $name =="
  timeout "$tmo" "$@" >"$LOG/$name.json" 2>"$LOG/$name.err"
  echo "   rc=$? -> $LOG/$name.json ($(wc -c <"$LOG/$name.json") bytes)"
  assemble_all
}

# short headline first: primes the fused-kernel compile cache the later
# steps share, and gives an early warning if the kernel regressed
step bench 900 python bench.py

step serving_pool 1500 python benchmarks/latency.py --tpu --pool 128 \
    --ticks 2000 --output ulaw --pool-blocks 1024 2048 4096
step serving_tick 900 python benchmarks/serving.py

step fidelity 2700 python benchmarks/fidelity_suite.py --tpu

step throughput 1500 python benchmarks/throughput.py \
    --batches 16,64,128,256,512,1024
step throughput_attr 1200 python benchmarks/throughput.py --attr \
    --batches 256,512

cat > /tmp/cli_solo_r03.py <<'EOF'
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
print(json.dumps({"bench": "cli_solo", "text_seconds": audio_s,
                  "x_realtime_wall": round(best or 0.0, 1),
                  "note": "one-shot wall incl. ~30ms tunnel sync + host "
                          "frontend; production solo path = fused "
                          "overlap-save split"}))
EOF
step cli_solo 900 python /tmp/cli_solo_r03.py

echo "capture done: $(ls -la $LOG)"
