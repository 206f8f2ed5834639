#!/bin/bash
# Tunnel watcher: retry tools/tpu_backlog.sh until the backend comes up and the
# queue completes (or ~11 h elapse). The backlog itself gates each attempt on a
# bounded health probe and exits 1 fast while the tunnel is down.
#
# usage: nohup tools/tpu_watch.sh > /dev/null 2>&1 & echo $! > /tmp/tpu_watch.pid
cd /root/repo
DEADLINE=$(( $(date +%s) + 39600 ))
echo "watch start $(date +%H:%M:%S)" >> /tmp/backlog/watch.log 2>/dev/null || { mkdir -p /tmp/backlog; echo "watch start $(date +%H:%M:%S)" >> /tmp/backlog/watch.log; }
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  bash tools/tpu_backlog.sh
  if grep -q "BACKLOG DONE" /tmp/backlog/driver.log 2>/dev/null; then
    echo "watch: backlog complete $(date +%H:%M:%S)" >> /tmp/backlog/watch.log
    exit 0
  fi
  echo "watch: backend still down, retry in 300s $(date +%H:%M:%S)" >> /tmp/backlog/watch.log
  sleep 300
done
echo "watch: deadline reached $(date +%H:%M:%S)" >> /tmp/backlog/watch.log
