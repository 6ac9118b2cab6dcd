#!/bin/bash
# Round-4 TPU measurement queue (consolidated, re-ordered 08-18).
#
# Ordering principle: every SHORT measurement (headline benches, sampling
# strategy / tile / k_cands A/Bs, embed-gather A/B) lands BEFORE the two
# multi-hour quality runs, so if the tunnel returns late the driver's
# round-end bench and the A/B verdicts aren't starved behind a 3h train.
# All invoked entrypoints also take the advisory device lock
# (ark_tpu/utils/device_lock.py), so a driver bench can at worst wait on
# one in-flight item, never interleave with it.
cd /root/repo
log(){ echo "[queue $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }

log "master queue: waiting for tunnel"
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  log "tunnel still down"; sleep 120
done

# ---- Stage A: headline benches -------------------------------------------
log "tunnel up; bench (ARK headline)"
timeout 3600 python bench.py > /tmp/bench_ark.json 2> /tmp/bench_ark.log
log "bench ARK exit=$?"
log "bench (t-ARK mode)"
timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK python bench.py > /tmp/bench_tark.json 2> /tmp/bench_tark.log
log "bench t-ARK exit=$?"
log "bench (sample chunk 1024 A/B)"
timeout 3600 env ARK_TPU_BENCH_SAMPLE_BATCH=1024 python bench.py > /tmp/bench_ark_1024.json 2> /tmp/bench_ark_1024.log
log "bench 1024 exit=$?"
log "queue done"

# ---- Stage B: sampling strategy + embed-gather A/Bs ----------------------
log "embed-gather A/B (xla vs pallas block/dma)"
timeout 3600 python scripts/bench_embed_gather.py > /tmp/embed_ab.json 2> /tmp/embed_ab.log
log "embed A/B exit=$?"
log "bench (expmin sampling strategy A/B, train skipped)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_STRATEGY=expmin python bench.py > /tmp/bench_expmin.json 2> /tmp/bench_expmin.log
log "bench expmin exit=$?"
log "bench (bf16 head streaming A/B, train skipped)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 python bench.py > /tmp/bench_wbf16.json 2> /tmp/bench_wbf16.log
log "bench wbf16 exit=$?"
log "bench (expmin + bf16 head combined, train skipped)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_STRATEGY=expmin ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 python bench.py > /tmp/bench_expmin_wbf16.json 2> /tmp/bench_expmin_wbf16.log
log "bench expmin+wbf16 exit=$?"
log "gumbel control (train skipped; same untrained-params protocol as the A/Bs)"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 python bench.py > /tmp/bench_gumbel_ctl.json 2> /tmp/bench_gumbel_ctl.log
log "bench gumbel control exit=$?"
log "queue3 done"

# ---- Stage C: tile-geometry + k_cands grids ------------------------------
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
log "queue4-tiles done"
log "k_cands A/B: k=3 default tile"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=3 \
  python bench.py > /tmp/bench_k3.json 2> /tmp/bench_k3.log
log "k3 exit=$?"
log "k_cands A/B: k=2 default tile"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=2 \
  python bench.py > /tmp/bench_k2.json 2> /tmp/bench_k2.log
log "k2 exit=$?"
log "k_cands A/B: k=3 at vblock 2048 rowchunk 256"
timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=3 \
  ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 \
  python bench.py > /tmp/bench_k3_vb2048.json 2> /tmp/bench_k3_vb2048.log
log "k3 vb2048 exit=$?"
log "queue5 done"

# ---- Stage D: long quality runs (LAST — hours each) ----------------------
log "wd-articles track_best_validity run (40 epochs, shipped protocol)"
timeout 10800 python -m ark_tpu.experiments.train --config /tmp/wda_bv.yaml \
  --checkpoint-dir runs_r4/wda_bv > /tmp/wda_bv.log 2>&1
log "wda_bv train exit=$?"
BV=$(ls runs_r4/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
if [ -n "$BV" ]; then
  timeout 3600 python -m ark_tpu.experiments.evaluate --checkpoint "$BV" \
    --split test --num-samples 1000 > /tmp/wda_bv_eval.json 2> /tmp/wda_bv_eval.log
  log "wda_bv best-validity eval exit=$?"
  BM=$(ls runs_r4/wda_bv/*/wd-articles_ARK_best_model.pt 2>/dev/null | head -1)
  timeout 3600 python -m ark_tpu.experiments.evaluate --checkpoint "$BM" \
    --split test --num-samples 1000 > /tmp/wda_bm_eval.json 2> /tmp/wda_bm_eval.log
  log "wda_bv best-val-loss eval exit=$?"
else
  log "no best_validity checkpoint found"
fi
log "queue2 done"

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
log "master queue done"
