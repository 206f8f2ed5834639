#!/bin/bash
# TPU backlog pass 5:
#  - headline bench at the new default (flash_q8s remat + mask-skip/exp2 flash
#    kernels + bf16 dq partials).
#  - clean spec-pair retrain (backlog4's two instances collided on checkpoint
#    writes): document masking, warmup+decay LR, 2x data, 2x steps, 4L draft.
#  - bench_spec_trained with the new pair (VERDICT #3: need vs_plain > 1).
#  - profile_8b rerun at the new step (roofline NameError fixed this round).
#
# usage: nohup tools/tpu_backlog5.sh > /dev/null 2>&1 & echo $! > /tmp/backlog5.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog5
mkdir -p $LOG

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

step ablate_qkv_q8s 2400 python tools/ablate_8b.py --variants remat=flash_qkv_q8s

if grep -q "flash_qkv_q8s.*ms/step" $LOG/ablate_qkv_q8s.log; then
  QKV=$(grep "flash_qkv_q8s" $LOG/ablate_qkv_q8s.log | grep -o '[0-9.]* ms' | cut -d' ' -f1)
  WIN=$(python -c "print(1 if float('$QKV' or 1e9) < 888.0 else 0)")
  if [ "$WIN" = "1" ]; then
    step bench_headline 3600 python bench.py --remat flash_qkv_q8s
  else
    step bench_headline 3600 python bench.py
  fi
else
  step bench_headline 3600 python bench.py
fi

step train_spec_target4 3600 python train_metamathqa.py \
  --synthetic 4096 --synthetic_task count --document_mask \
  --synthetic_config '{"num_layers":16,"embed_dim":1024,"head_dim":64,"num_heads":16,"num_kv_heads":8,"intermediate_dim":2816}' \
  --max_seq_len 512 --batch_size 16 --n_steps 3000 --lr 1e-3 \
  --warmup 0.03 --decay 0.5 --ckpt_interval 3000 --run_name spec_target4

step train_spec_draft4 2400 python train_metamathqa.py \
  --synthetic 4096 --synthetic_task count --document_mask \
  --synthetic_config '{"num_layers":4,"embed_dim":256,"head_dim":32,"num_heads":8,"num_kv_heads":4,"intermediate_dim":512}' \
  --max_seq_len 512 --batch_size 16 --n_steps 3000 --lr 1e-3 \
  --warmup 0.03 --decay 0.5 --ckpt_interval 3000 --run_name spec_draft4

TGT=$(ls -dt runs/metamathqa/spec_target4_* 2>/dev/null | head -1)
DFT=$(ls -dt runs/metamathqa/spec_draft4_* 2>/dev/null | head -1)
echo "pair: $TGT / $DFT" >> $LOG/driver.log
step bench_spec_trained 3600 python tools/bench_spec_trained.py \
  --resume "$TGT" --draft_resume "$DFT" --gamma 4

step profile_8b 3600 python tools/profile_8b.py --steps 3

echo "BACKLOG5 DONE $(date +%H:%M:%S)" >> $LOG/driver.log
