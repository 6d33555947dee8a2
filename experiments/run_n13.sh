#!/bin/bash
# Auto-resume wrapper for the N=13 production-horizon cheb-step trace.
# The engine checkpoints at every dispatch boundary (dynamics/cheb_step.py),
# so each retry resumes losslessly.  Retries are gated on the JSON status
# (large_bath.py catches exceptions and records status=failed with rc 0).
# A wall-clock deadline bounds the whole loop so it never outlives the round.
set -u
cd /root/repo
# spd=64 reproducibly crashes the TPU worker at dim 16384 (compile-side);
# spd=8 is proven and has identical warm throughput (0.60 steps/s).
export QST_CHEB_STEPS_PER_DISPATCH=${QST_CHEB_STEPS_PER_DISPATCH:-8}
STOP_FILE=${QST_STOP_FILE:-/root/repo/.qst_stop}
rm -f "$STOP_FILE"   # a fresh launch owns the device until asked to yield
DEADLINE=$(( $(date +%s) + ${N13_DEADLINE_S:-37800} ))   # default 10.5 h
LOG=/tmp/n13_run.log
echo "[wrapper] start $(date -Is) deadline_epoch=$DEADLINE" >> "$LOG"
for i in $(seq 1 60); do
  now=$(date +%s)
  left=$(( DEADLINE - now ))
  if [ "$left" -le 120 ]; then
    echo "[wrapper] deadline reached, stopping (attempt $i)" >> "$LOG"
    break
  fi
  echo "[wrapper] attempt $i, ${left}s left" >> "$LOG"
  timeout "$left" python experiments/large_bath.py --cheb-step-only \
    --n-sea 13 --t-final 30.0 --steps 20000 >> "$LOG" 2>&1
  status=$(python - <<'EOF'
import json
try:
    d = json.load(open("experiments/large_bath_results.json"))
    print(d.get("cheb_step_n13", {}).get("status", "missing"))
except Exception:
    print("unreadable")
EOF
)
  echo "[wrapper] attempt $i exit status=$status $(date -Is)" >> "$LOG"
  if [ "$status" = "ok" ]; then
    echo "[wrapper] DONE" >> "$LOG"
    break
  fi
  if [ -f "$STOP_FILE" ] || [ "$status" = "stopped" ]; then
    echo "[wrapper] cooperative stop requested; yielding the device" >> "$LOG"
    break
  fi
  sleep 15
done
echo "[wrapper] exit $(date -Is)" >> "$LOG"
