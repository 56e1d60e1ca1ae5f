#!/bin/bash
# Supervise the r5 quality gate against axon-tunnel stalls: restart with
# --resume whenever the log goes stale for >8 min; exit when the artifact
# (quality_gate.json) appears or after MAX_RESTARTS.
set -u
cd /root/repo
WS=/tmp/qgate_r5
LOG=/tmp/qgate_r5b.log
STALE=480
MAX_RESTARTS=12
restarts=0

gate_running() {
  [ -f /tmp/qgate_r5.pid ] && kill -0 "$(cat /tmp/qgate_r5.pid)" 2>/dev/null
}

launch() {
  setsid nohup env LAENERF_FLAT_OPT=0 python -u scripts/quality_gate.py \
    --workspace "$WS" --iters 30000 --num_levels 16 --level_dim 2 \
    --max_steps 1024 --resume >> "$LOG" 2>&1 < /dev/null &
  sleep 3
  ps -eo pid,cmd | grep "python -u scripts/quality_gate" | grep -v grep \
    | awk '{print $1}' | head -1 > /tmp/qgate_r5.pid
  echo "[watchdog] launched gate pid $(cat /tmp/qgate_r5.pid) $(date)"
}

while :; do
  if [ -f "$WS/quality_gate.json" ]; then
    echo "[watchdog] artifact present — done $(date)"
    exit 0
  fi
  if ! gate_running; then
    if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
      echo "[watchdog] gate dead and restart budget exhausted $(date)"
      exit 1
    fi
    restarts=$((restarts + 1))
    echo "[watchdog] gate not running — restart #$restarts $(date)"
    launch
  else
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALE" ]; then
      if [ "$restarts" -ge "$MAX_RESTARTS" ]; then
        echo "[watchdog] stale and restart budget exhausted $(date)"
        exit 1
      fi
      restarts=$((restarts + 1))
      echo "[watchdog] log stale ${age}s — kill + resume #$restarts $(date)"
      kill "$(cat /tmp/qgate_r5.pid)" 2>/dev/null
      sleep 8
      kill -9 "$(cat /tmp/qgate_r5.pid)" 2>/dev/null
      sleep 2
      launch
    fi
  fi
  sleep 60
done
