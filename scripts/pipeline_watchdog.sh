#!/bin/bash
# Watchdog for scripts/r4_pipeline.sh on the flaky TPU tunnel: the known
# failure mode is a tunnel hang (child python frozen in futex_do_wait; a
# background thread still creeps ~2-3% CPU, so CPU-equality alone is NOT a
# reliable hang test — it missed a mid-training hang at epoch 128/150).
# Liveness = (any file under exps/<out>/ changed) OR (child CPU advanced
# >= CPU_MIN jiffies in one poll — a compile burns >50% of the core, the
# hang creeps ~3%).  On a verdict of hung: kill the tracked PIDs (never
# pattern kills), relaunch the idempotent pipeline (training stages resume
# from their _wip snapshots), and log the action.
cd /root/repo
OUTDIR=${OUTDIR:-exps/r4}
WLOG=/tmp/watchdog.log
WINDOW=${WINDOW:-600}
POLL=60
CPU_MIN=${CPU_MIN:-500}   # jiffies per poll (~8% of one core)
cpu_jiffies() {
  local pid=$1 total=0
  for p in $pid $(pgrep -P "$pid") $(pgrep -P "$pid" | xargs -r -n1 pgrep -P 2>/dev/null); do
    if [ -r "/proc/$p/stat" ]; then
      read -r -a f < "/proc/$p/stat"
      total=$((total + f[13] + f[14]))
    fi
  done
  echo $total
}
newest_mtime() { find "$OUTDIR" -type f -newermt "@$1" -print -quit 2>/dev/null; }
last_change=$(date +%s)
prev_cpu=0
while true; do
  sleep $POLL
  BPID=$(cat /tmp/pipeline.pid 2>/dev/null)
  if [ -z "$BPID" ] || ! kill -0 "$BPID" 2>/dev/null; then
    if grep -q "FLAGSHIP DONE" "$OUTDIR/pipeline.log" 2>/dev/null; then
      echo "$(date -u +%T) pipeline complete; watchdog exiting" >>"$WLOG"
      exit 0
    fi
    echo "$(date -u +%T) pipeline gone without FLAGSHIP DONE — relaunching" >>"$WLOG"
    bash scripts/r4_pipeline.sh > /tmp/r5_pipeline_stdout.log 2>&1 &
    echo $! > /tmp/pipeline.pid
    last_change=$(date +%s)
    continue
  fi
  now=$(date +%s)
  cpu=$(cpu_jiffies "$BPID")
  if [ -n "$(newest_mtime "$last_change")" ] \
      || [ $((cpu - prev_cpu)) -ge $CPU_MIN ]; then
    last_change=$now
  fi
  prev_cpu=$cpu
  if [ $((now - last_change)) -gt $WINDOW ]; then
    echo "$(date -u +%T) HUNG (no output/cpu for $((now-last_change))s) — killing $BPID tree" >>"$WLOG"
    CHILDREN="$(pgrep -P "$BPID") $(pgrep -P "$BPID" | xargs -r -n1 pgrep -P 2>/dev/null)"
    kill "$BPID" $CHILDREN 2>/dev/null
    sleep 3
    kill -9 $CHILDREN 2>/dev/null
    sleep 2
    bash scripts/r4_pipeline.sh > /tmp/r5_pipeline_stdout.log 2>&1 &
    echo $! > /tmp/pipeline.pid
    echo "$(date -u +%T) relaunched as $(cat /tmp/pipeline.pid)" >>"$WLOG"
    last_change=$(date +%s)
  fi
done
