#!/bin/bash
# Round-4 perf capture: serving (deadline + tick + attribution), throughput,
# cli_solo. Serialized: ONE axon client at a time; run AFTER the fidelity
# capture and with no other load (single-core host — deadline rows are
# timing-sensitive). Artifacts re-assembled after EVERY step from per-step
# files (ADVICE r3 #1).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/capture_r04
mkdir -p "$LOG"
[ $# -ge 1 ] && while kill -0 "$1" 2>/dev/null; do sleep 10; done

assemble() {
  local dest=$1; shift
  local ok=0
  for f in "$@"; do [ -s "$f" ] && ok=1; done
  if [ "$ok" = 1 ]; then cat "$@" 2>/dev/null > "$dest"; fi
}

assemble_all() {
  assemble SERVING_r04.json "$LOG/serving_pool.json" "$LOG/serving_tick.json" \
      "$LOG/serving_attr.json"
  assemble THROUGHPUT_r04.json "$LOG/throughput.json" \
      "$LOG/throughput_attr.json" "$LOG/cli_solo.json"
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

# strict-deadline rows with the feeder-thread methodology (ADVICE r3 #4);
# 2048 is the VERDICT-r3 focus block
step serving_pool 2400 python benchmarks/latency.py --tpu --pool 128 \
    --ticks 2000 --output ulaw --pool-blocks 2048 4096 1024
# per-N aggregate rows + the 64->128 attribution sweep (VERDICT r3 weak #4)
step serving_tick 900 python benchmarks/serving.py --sizes 16 64 128
step serving_attr 900 python benchmarks/serving.py --attr \
    --sizes 64 128 256 --ticks 128

step throughput 1500 python benchmarks/throughput.py \
    --batches 16,64,128,256,512,1024
step throughput_attr 1200 python benchmarks/throughput.py --attr \
    --batches 256,512

cat > /tmp/cli_solo_r04.py <<'EOF'
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
    # a broken CLI must fail the step, not emit a plausible row (ADVICE r3 #2)
    sys.exit(1)
print(json.dumps({"bench": "cli_solo", "text_seconds": audio_s,
                  "x_realtime_wall": round(best, 1),
                  "note": "one-shot wall incl. ~30ms tunnel sync + host "
                          "frontend; production solo path = fused "
                          "overlap-save split"}))
EOF
step cli_solo 900 python /tmp/cli_solo_r04.py

echo "perf capture done: $(ls -la $LOG)"
