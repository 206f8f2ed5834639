#!/bin/bash
# Follow-up TPU backlog (round 4, pass 2):
#  - spec_target retrain: 16L at lr 3e-3 plateaued at loss ~2.1 and only started
#    dropping in the trapezoid decay — rerun cooler and longer (lr 1e-3, 1500 steps).
#  - bench_spec_trained with the retrained target (draft already at loss 0.043).
#  - vision headline rerun with the sweep-winning recipe (lr 1e-3 / 4000 steps hit
#    exact-match 1.0 in the sweep) including the checkpoint round-trip.
#  - bench headline re-capture with the grouped-LoRA delta (one x@A read for q/k/v
#    and w1/w3) to measure the step-time delta vs the 946 ms flash_proj baseline.
# (audio_preproc_share: DONE 2026-08-18 — 0.52% of step, runs/bench_omni/audio_preproc.json.
#  bench_q8: moved to the OOM investigation, tools/repro_q8_compile.py.)
#
# usage: nohup tools/tpu_backlog2.sh > /dev/null 2>&1 & echo $! > /tmp/backlog2.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog2
mkdir -p $LOG

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" >> $LOG/driver.log
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" >> $LOG/driver.log
}

# Wait (up to ~6 h) for the tunnel to come back — downtime measured in hours is the
# round-4 norm (BENCH_r03 rc=1; this morning's probes hung too). One 10-min
# wait_for_backend pass per outer loop, 5-min sleeps in between.
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

step bench_grouped_lora 3600 python bench.py

step train_spec_target2 5400 python train_metamathqa.py --synthetic 2048 --synthetic_task count \
  --synthetic_config '{"num_layers":16,"embed_dim":1024,"head_dim":64,"num_heads":16,"num_kv_heads":8,"intermediate_dim":2816}' \
  --max_seq_len 512 --batch_size 16 --n_steps 1500 --lr 1e-3 --run_name spec_target2

TGT=$(ls -dt runs/metamathqa/spec_target2_* 2>/dev/null | head -1)
DRF=$(ls -dt runs/metamathqa/spec_draft_* 2>/dev/null | head -1)
if [ -n "$TGT" ] && [ -n "$DRF" ]; then
  step bench_spec_trained 3000 python tools/bench_spec_trained.py --resume "$TGT" --draft_resume "$DRF" --gamma 4
fi

step vision_headline 3000 python tools/vision_synthetic.py --steps 4000 --lr 1e-3

echo "BACKLOG2 DONE $(date +%H:%M:%S)" >> $LOG/driver.log
