#!/bin/bash
# Serial TPU artifact backlog — everything that accumulated while the tunnel was
# down. Each step is independent, time-bounded, and logged; a failure (flaky
# remote compile, tunnel drop) moves on to the next step so one bad dispatch
# doesn't strand the rest. Logs: /tmp/backlog/<step>.log, summary driver.log.
#
# usage: nohup tools/tpu_backlog.sh > /dev/null 2>&1 & echo $! > /tmp/backlog.pid
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=/tmp/backlog
mkdir -p $LOG

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S)" >> $LOG/driver.log
  timeout "$t" "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name rc=$? $(date +%H:%M:%S)" >> $LOG/driver.log
}

# 0. gate on a healthy backend (bounded; gives up after ~10 min)
timeout 720 python -c "
from llama_x_tpu.utils.backend_probe import wait_for_backend
import sys; res = wait_for_backend(budget_s=600)
sys.exit(0 if res['ok'] else 1)" > $LOG/probe.log 2>&1
if [ $? -ne 0 ]; then echo "BACKEND DOWN — aborting $(date +%H:%M:%S)" >> $LOG/driver.log; exit 1; fi
echo "=== probe ok $(date +%H:%M:%S)" >> $LOG/driver.log

# 1. the headline (VERDICT #1): driver-shaped bench run
step bench_headline 5400 python bench.py

# 2. compiled decode-kernel parity incl. small-Sq + int8 (VERDICT #2)
step decode_parity 1800 python tools/tpu_decode_parity.py

# 3. machinery speculative bench rerun (small-Sq verify now on the kernel path)
step bench_speculative 3000 python tools/bench_speculative.py

# 3b. continuous-batching value on hardware: staggered-traffic throughput/TTFT,
# prefix-cache TTFT, chunked-prefill ITL (1b int8 weights; 8b is the capacity point)
step bench_continuous 3600 python tools/bench_continuous.py
step bench_continuous_8b 4800 python tools/bench_continuous.py --geometry 8b \
  --out runs/bench_serve/continuous_8b.json

# 4. trained draft/target pair (VERDICT #3): train both on the counting task, then bench
step train_spec_target 4800 python train_metamathqa.py --synthetic 2048 --synthetic_task count \
  --synthetic_config '{"num_layers":16,"embed_dim":1024,"head_dim":64,"num_heads":16,"num_kv_heads":8,"intermediate_dim":2816}' \
  --max_seq_len 512 --batch_size 16 --n_steps 600 --lr 3e-3 --run_name spec_target
step train_spec_draft 2400 python train_metamathqa.py --synthetic 2048 --synthetic_task count \
  --synthetic_config '{"num_layers":2,"embed_dim":256,"head_dim":32,"num_heads":8,"num_kv_heads":4,"intermediate_dim":512}' \
  --max_seq_len 512 --batch_size 16 --n_steps 600 --lr 3e-3 --run_name spec_draft
TGT=$(ls -dt runs/metamathqa/spec_target_* 2>/dev/null | head -1)
DRF=$(ls -dt runs/metamathqa/spec_draft_* 2>/dev/null | head -1)
if [ -n "$TGT" ] && [ -n "$DRF" ]; then
  step bench_spec_trained 3000 python tools/bench_spec_trained.py --resume "$TGT" --draft_resume "$DRF" --gamma 4
fi

# 5. audio-preproc share of the 8B step (VERDICT #5 / BASELINE sub-target)
step audio_preproc 2400 python tools/audio_preproc_share.py

# 6. XSpace profile + top-op table of the 8B step (VERDICT #6)
step profile_8b 3000 python tools/profile_8b.py

# 7. remat-policy candidate: does flash_proj_q8 beat the flash_proj default?
step bench_q8 5400 python bench.py --remat flash_proj_q8

# 8. vision recipe sweep (VERDICT #7): CPU runs cost ~45 min/config, TPU ~2 min.
# base800 (patch6+newline, 800 steps) measured 0.25 exact-match with loss still
# falling — push steps and capacity toward the >= 0.5 disjoint-eval target.
step vision_base3k 2400 python tools/vision_synthetic.py --steps 3000 --skip_save \
  --out_dir runs/vision_synthetic/sweep/base3000
step vision_big 2400 python tools/vision_synthetic.py --steps 3000 --embed_dim 384 \
  --num_layers 6 --skip_save --out_dir runs/vision_synthetic/sweep/big3000
step vision_lowlr 2400 python tools/vision_synthetic.py --steps 4000 --lr 1e-3 \
  --skip_save --out_dir runs/vision_synthetic/sweep/lowlr4000

# 9. full knob ablation table (slowest: compiles every variant)
step ablate_8b 9000 python tools/ablate_8b.py

echo "BACKLOG DONE $(date +%H:%M:%S)" >> $LOG/driver.log
