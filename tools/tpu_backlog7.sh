#!/bin/bash
# TPU backlog pass 7 (after backlog6): speculative CONTINUOUS batching with the
# trained pair — the serving-shaped form of the 1.48x fused-batch result.
# usage: nohup tools/tpu_backlog7.sh > /dev/null 2>&1 & echo $! > /tmp/backlog7.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog7
mkdir -p $LOG

B6=$(cat /tmp/backlog6.pid 2>/dev/null)
for i in $(seq 1 300); do
  if [ -z "$B6" ] || ! kill -0 "$B6" 2>/dev/null; then break; fi
  sleep 60
done
echo "=== backlog6 done, starting $(date +%H:%M:%S)" >> $LOG/driver.log

step() {
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" >> $LOG/driver.log
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" >> $LOG/driver.log
}

for i in $(seq 1 24); do
  timeout 720 python -c "
from llama_x_tpu.utils.backend_probe import wait_for_backend
import sys; res = wait_for_backend(budget_s=600)
sys.exit(0 if res['ok'] else 1)" >> $LOG/probe.log 2>&1
  if [ $? -eq 0 ]; then break; fi
  echo "backend still down (pass $i) $(date +%H:%M:%S)" >> $LOG/driver.log
  if [ "$i" -eq 24 ]; then echo "BACKEND DOWN — aborting" >> $LOG/driver.log; exit 1; fi
  sleep 300
done
echo "=== probe ok $(date +%H:%M:%S)" >> $LOG/driver.log

TGT=$(ls -dt runs/metamathqa/spec_target4_* 2>/dev/null | head -1)
DFT=$(ls -dt runs/metamathqa/spec_draft4_* 2>/dev/null | head -1)
if [ -z "$TGT" ]; then TGT=$(ls -dt runs/metamathqa/spec_target3_* | head -1); fi
if [ -z "$DFT" ]; then DFT=$(ls -dt runs/metamathqa/spec_draft2_* | head -1); fi
echo "pair: $TGT / $DFT" >> $LOG/driver.log

step spec_continuous 3600 python tools/bench_spec_continuous.py \
  --resume "$TGT" --draft_resume "$DFT" --gamma 4

echo "BACKLOG7 DONE $(date +%H:%M:%S)" >> $LOG/driver.log
