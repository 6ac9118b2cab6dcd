#!/bin/bash
# Queue 4 (chained on queue3): fused-sampler tile-geometry A/Bs + the
# wd-movies plain-SAIL quality run with latent figures.
cd /root/repo
log(){ echo "[queue4 $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }
until grep -q "queue3 done" /tmp/tpu_queue.log 2>/dev/null; do sleep 120; done

# Tile grid: bigger vocab tiles amortize the per-block overhead that
# dominates sampling (BENCH_NOTES round-2 tile table: 512->1024 was 1.4x);
# VMEM bounds vblock x rowchunk so 2048 tiles need <= 256 rows. A compile
# failure (VMEM overflow) shows up as a nonzero exit + the log tail.
log "tile A/B: vblock 2048 rowchunk 256 (f32)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 \
  ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 python bench.py \
  > /tmp/bench_vb2048_rc256.json 2> /tmp/bench_vb2048_rc256.log
log "vb2048 rc256 exit=$?"
log "tile A/B: vblock 2048 rowchunk 256 + bf16 head"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 \
  ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 \
  python bench.py \
  > /tmp/bench_vb2048_rc256_bf16.json 2> /tmp/bench_vb2048_rc256_bf16.log
log "vb2048 rc256 bf16 exit=$?"
log "tile A/B: vblock 2048 rowchunk 128 (f32, VMEM fallback point)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 \
  ARK_TPU_BENCH_SAMPLE_ROWCHUNK=128 python bench.py \
  > /tmp/bench_vb2048_rc128.json 2> /tmp/bench_vb2048_rc128.log
log "vb2048 rc128 exit=$?"
log "tile A/B: vblock 1024 rowchunk 256 (rowchunk-effect control)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=1024 \
  ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 python bench.py \
  > /tmp/bench_vb1024_rc256.json 2> /tmp/bench_vb1024_rc256.log
log "vb1024 rc256 exit=$?"

log "wd-movies plain-SAIL quality run (reference 150-epoch protocol)"
python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/autoreg_wd-movies.yaml"))
cfg.update(model_type="SAIL", experiment_name="wdm_sail_r4")
yaml.safe_dump(cfg, open("/tmp/wdm_sail_r4.yaml", "w"))
PY
timeout 10800 python -m ark_tpu.experiments.train --config /tmp/wdm_sail_r4.yaml \
  --checkpoint-dir runs_r4/wdm_sail > /tmp/wdm_sail.log 2>&1
log "wdm_sail train exit=$?"
run_dir=$(ls -d runs_r4/wdm_sail/*/ 2>/dev/null | head -1)
if [ -n "$run_dir" ]; then
  log "latent analysis + t-SNE genre figures from $run_dir"
  timeout 7200 python -m ark_tpu.experiments.interpolation \
    --config /tmp/wdm_sail_r4.yaml --checkpoint-dir "$run_dir" \
    --directions 3 > /tmp/wdm_sail_interp.log 2>&1
  log "wdm_sail interpolation exit=$?"
fi
log "queue4 done"
