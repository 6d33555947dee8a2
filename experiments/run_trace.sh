#!/bin/bash
# Auto-resume wrapper for a production-horizon cheb-step trace (any n_sea).
# Generalizes run_n13.sh (the wrapper that carried the measured N=13 run).
# The engine checkpoints at the configured dispatch cadence
# (dynamics/cheb_step.py), so each retry resumes losslessly.  Retries are
# gated on the JSON status (large_bath.py catches exceptions and records
# status=failed with rc 0).  A wall-clock deadline bounds the whole loop.
#
# Usage: N_SEA=14 [QST_CHEB_ARITH=ext] [QST_TRACE_DEADLINE_S=36000] \
#        bash experiments/run_trace.sh
set -u
cd /root/repo
N_SEA=${N_SEA:-14}
T_FINAL=${T_FINAL:-30.0}
STEPS=${STEPS:-20000}
# spd>1 builds a longer scan program; spd=8 reproducibly crashed the TPU
# worker at dim 32768 on the f64 tier (compile-side fault class) — spd=1 is
# the proven setting at dim >= 32768.  Checkpoint cadence keeps the save
# cost negligible at spd=1 (save every ~40 s, lose <= 30 dispatches).
export QST_CHEB_STEPS_PER_DISPATCH=${QST_CHEB_STEPS_PER_DISPATCH:-1}
export QST_CHEB_CKPT_EVERY_DISPATCHES=${QST_CHEB_CKPT_EVERY_DISPATCHES:-30}
export QST_CHEB_ARITH=${QST_CHEB_ARITH:-ext}
STOP_FILE=${QST_STOP_FILE:-/root/repo/.qst_stop}
rm -f "$STOP_FILE"   # a fresh launch owns the device until asked to yield
# bench.py's cooperative eviction (_claim_device) probes this pid file to
# know a trace wrapper is live before raising the stop flag
PID_FILE=/tmp/qst_trace_wrapper.pid
echo $$ > "$PID_FILE"
trap 'rm -f "$PID_FILE"' EXIT
DEADLINE=$(( $(date +%s) + ${QST_TRACE_DEADLINE_S:-36000} ))   # default 10 h
LOG=/tmp/n${N_SEA}_run.log
echo "[wrapper] start $(date -Is) n_sea=$N_SEA arith=$QST_CHEB_ARITH deadline_epoch=$DEADLINE" >> "$LOG"
for i in $(seq 1 60); do
  now=$(date +%s)
  left=$(( DEADLINE - now ))
  if [ "$left" -le 120 ]; then
    echo "[wrapper] deadline reached, stopping (attempt $i)" >> "$LOG"
    break
  fi
  echo "[wrapper] attempt $i, ${left}s left" >> "$LOG"
  timeout "$left" python experiments/large_bath.py --cheb-step-only \
    --n-sea "$N_SEA" --t-final "$T_FINAL" --steps "$STEPS" >> "$LOG" 2>&1 &
  RUN_PID=$!
  # Stall watchdog: a dispatch blocked on a dead tunnel/worker hangs the
  # client forever without tripping `timeout` (observed 2026-08-19: n14
  # stalled 9+ min mid-step with 0 CPU).  Progress prints land in $LOG every
  # dispatch (~1-15 s); no log growth for STALL_S means the attempt is dead —
  # kill it (checkpointed progress makes the retry lossless).
  STALL_S=${QST_STALL_S:-600}
  while kill -0 "$RUN_PID" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -ge "$STALL_S" ]; then
      echo "[wrapper] STALL: no log progress for ${age}s, killing attempt $i" >> "$LOG"
      kill "$RUN_PID" 2>/dev/null
      sleep 10
      kill -9 "$RUN_PID" 2>/dev/null
      break
    fi
  done
  wait "$RUN_PID" 2>/dev/null
  # The record key is shared with earlier short probes at the same n_sea
  # (observed 2026-08-20: an 8-step round-4 probe's stale status="ok" made
  # the wrapper declare a killed 20k-step attempt DONE).  Completion means
  # status ok AND the record describes THIS workload (t_final, steps).
  status=$(python - <<EOF
import json
try:
    d = json.load(open("experiments/large_bath_results.json"))
    r = d.get("cheb_step_n${N_SEA}", {})
    s = r.get("status", "missing")
    if s == "ok" and not (
        abs(float(r.get("t_final", -1.0)) - float("${T_FINAL}")) < 1e-9
        and int(r.get("steps", -1)) == int("${STEPS}")
    ):
        s = "incomplete"
    print(s)
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
