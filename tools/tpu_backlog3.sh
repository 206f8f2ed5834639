#!/bin/bash
# TPU backlog pass 3 (runs after backlog2 releases the chip):
#  - q8s remat ablation at 8B: flash_proj_q8s skips the h3-recompute OOM that
#    killed every full-q8 row in backlog1's ablate_8b run; expected win is the
#    w1-or-w3 backward recompute (~40 ms/step of int8 GEMM at S=4096).
#  - re-baseline flash_proj in the same session so the comparison is same-tunnel.
#  - if q8s wins, bench.py --remat flash_proj_q8s for the headline candidate.
#  - profile_8b rerun: refresh the trace + roofline at the grouped-LoRA step
#    (the committed roofline.json is from the 946 ms pre-grouped step).
#
# usage: nohup tools/tpu_backlog3.sh > /dev/null 2>&1 & echo $! > /tmp/backlog3.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog3
mkdir -p $LOG

# wait for backlog2 to release the chip (poll its pid; bounded at 5 h)
B2=$(cat /tmp/backlog2.pid 2>/dev/null)
for i in $(seq 1 300); do
  if [ -z "$B2" ] || ! kill -0 "$B2" 2>/dev/null; then break; fi
  sleep 60
done
echo "=== backlog2 done, starting $(date +%H:%M:%S)" >> $LOG/driver.log

step() { # step <name> <timeout_s> <cmd...>
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
  if [ "$i" -eq 24 ]; then echo "BACKEND DOWN — aborting $(date +%H:%M:%S)" >> $LOG/driver.log; exit 1; fi
  sleep 300
done
echo "=== probe ok $(date +%H:%M:%S)" >> $LOG/driver.log

step ablate_q8s 3600 python tools/ablate_8b.py --variants q8s,remat=flash_proj,baseline

if grep -q "flash_proj_q8s.*ms/step" $LOG/ablate_q8s.log; then
  Q8S=$(grep "flash_proj_q8s" $LOG/ablate_q8s.log | grep -o '[0-9.]* ms' | cut -d' ' -f1)
  BASE=$(grep "remat=flash_proj " $LOG/ablate_q8s.log | grep -o '[0-9.]* ms' | cut -d' ' -f1)
  echo "q8s=$Q8S base=$BASE" >> $LOG/driver.log
  WIN=$(python -c "print(1 if float('$Q8S' or 1e9) < float('$BASE' or 0) else 0)")
  if [ "$WIN" = "1" ]; then
    step bench_q8s 3600 python bench.py --remat flash_proj_q8s
  fi
fi

step profile_8b 3600 python tools/profile_8b.py --steps 3

echo "BACKLOG3 DONE $(date +%H:%M:%S)" >> $LOG/driver.log
