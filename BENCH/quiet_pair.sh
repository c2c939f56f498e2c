#!/bin/bash
# Opportunistic 8->32 saturation rerun: probe the shared host every ~8 min;
# when a quiet window appears (per-core speed at 32-busy >= 85% of 8-busy),
# immediately measure the local[8] and local[32] crawl back-to-back and
# append the results to /tmp/quiet_pair.jsonl. Exits after one quiet pair
# or after MAX_TRIES probes.
set -u
cd "$(dirname "$0")/.."
MAX_TRIES=${MAX_TRIES:-18}
OUT=/tmp/quiet_pair.jsonl
for i in $(seq 1 "$MAX_TRIES"); do
  probe=$(python BENCH/cpu_probe.py 2>/dev/null)
  ratio=$(python - "$probe" <<'EOF'
import json, sys
d = json.loads(sys.argv[1])
print(round(d["8"]["mean_task_sec"] / d["32"]["mean_task_sec"], 3))
EOF
)
  echo "{\"probe\": $probe, \"ratio_8v32\": $ratio, \"try\": $i}" >> "$OUT"
  ok=$(python -c "print(1 if $ratio >= 0.85 else 0)")
  if [ "$ok" = "1" ]; then
    taskset -c 0-7  python BENCH/scaling_worker.py 8  120000 12000 3 2>/dev/null | tail -1 >> "$OUT"
    taskset -c 0-31 python BENCH/scaling_worker.py 32 120000 12000 3 2>/dev/null | tail -1 >> "$OUT"
    echo '{"quiet_pair_done": true}' >> "$OUT"
    exit 0
  fi
  sleep 480
done
echo '{"quiet_pair_done": false}' >> "$OUT"
