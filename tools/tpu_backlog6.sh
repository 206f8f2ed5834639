#!/bin/bash
# TPU backlog pass 6 (runs after backlog5 releases the chip):
#  - omni synthetic with the recipe that closed vision to 1.0 exact-match
#    (lr 1e-3 + ~4x steps; newline tokens were already on): target is lifting
#    image_half_acc from 0.469 (VERDICT weak #6).
#  - speculative gamma sweep on the trained pair (gamma=4 measured 1.48x).
#  - flash block re-sweep: the mask-skip/exp2 kernels may move the bq/bk optimum.
#
# usage: nohup tools/tpu_backlog6.sh > /dev/null 2>&1 & echo $! > /tmp/backlog6.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog6
mkdir -p $LOG

B5=$(cat /tmp/backlog5.pid 2>/dev/null)
for i in $(seq 1 300); do
  if [ -z "$B5" ] || ! kill -0 "$B5" 2>/dev/null; then break; fi
  sleep 60
done
echo "=== backlog5 done, starting $(date +%H:%M:%S)" >> $LOG/driver.log

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

step omni_tuned 3600 python tools/omni_synthetic.py --steps 3000 --lr 1e-3

TGT=$(ls -dt runs/metamathqa/spec_target4_* 2>/dev/null | head -1)
DFT=$(ls -dt runs/metamathqa/spec_draft4_* 2>/dev/null | head -1)
if [ -z "$TGT" ]; then TGT=$(ls -dt runs/metamathqa/spec_target3_* | head -1); fi
if [ -z "$DFT" ]; then DFT=$(ls -dt runs/metamathqa/spec_draft2_* | head -1); fi
echo "pair: $TGT / $DFT" >> $LOG/driver.log
step spec_gamma2 1800 python tools/bench_spec_trained.py \
  --resume "$TGT" --draft_resume "$DFT" --gamma 2 \
  --out runs/bench_speculative/trained_pair_gamma2.json
step spec_gamma6 1800 python tools/bench_spec_trained.py \
  --resume "$TGT" --draft_resume "$DFT" --gamma 6 \
  --out runs/bench_speculative/trained_pair_gamma6.json

step sweep_flash 3600 python tools/sweep_flash_blocks.py

echo "BACKLOG6 DONE $(date +%H:%M:%S)" >> $LOG/driver.log
