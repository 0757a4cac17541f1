#!/bin/bash
# Watchdog for scripts/r4_pipeline.sh on the flaky TPU tunnel: the known
# failure mode is a first-dispatch hang (child python frozen in
# futex_do_wait with zero CPU accumulation and no log output).  Liveness =
# (pipeline.log grew) OR (child CPU jiffies advanced) within WINDOW s.
# On a verdict of hung: kill the tracked PIDs (never pattern kills),
# relaunch the idempotent pipeline, and log the action.
cd /root/repo
LOG=exps/r4/pipeline.log
WLOG=/tmp/watchdog.log
WINDOW=600
POLL=60
cpu_jiffies() { # sum utime+stime of bash child tree (python descendants)
  local pid=$1 total=0
  for p in $pid $(pgrep -P "$pid") $(pgrep -P "$pid" | xargs -r -n1 pgrep -P 2>/dev/null); do
    if [ -r "/proc/$p/stat" ]; then
      read -r -a f < "/proc/$p/stat"
      total=$((total + f[13] + f[14]))
    fi
  done
  echo $total
}
last_change=$(date +%s)
prev_size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
prev_cpu=0
while true; do
  sleep $POLL
  BPID=$(cat /tmp/pipeline.pid 2>/dev/null)
  if [ -z "$BPID" ] || ! kill -0 "$BPID" 2>/dev/null; then
    if grep -q "FLAGSHIP DONE" "$LOG" 2>/dev/null; then
      echo "$(date -u +%T) pipeline complete; watchdog exiting" >>"$WLOG"
      exit 0
    fi
    echo "$(date -u +%T) pipeline process gone without FLAGSHIP DONE — relaunching" >>"$WLOG"
    bash scripts/r4_pipeline.sh > /tmp/r5_pipeline_stdout.log 2>&1 &
    echo $! > /tmp/pipeline.pid
    last_change=$(date +%s)
    continue
  fi
  size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  cpu=$(cpu_jiffies "$BPID")
  now=$(date +%s)
  if [ "$size" != "$prev_size" ] || [ "$cpu" != "$prev_cpu" ]; then
    last_change=$now
  fi
  prev_size=$size; prev_cpu=$cpu
  if [ $((now - last_change)) -gt $WINDOW ]; then
    echo "$(date -u +%T) HUNG (no log/cpu for $((now-last_change))s) — killing $BPID tree" >>"$WLOG"
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
