#!/bin/bash
# Round-5 TPU measurement queue.
#
# Same design as tpu_queue_master.sh (round 4): short measurements first,
# multi-hour quality runs last, every item restart-safe (skipped when its
# result artifact already landed), everything archived into the repo after
# each stage so results survive /tmp and late tunnel returns.
#
# Round-5 items (VERDICT.md "Next round" 1-4):
#   A. t-ARK full bench after the head-major KV-cache fix (target >=0.8x
#      GRU sampling; was 0.56x), embed-gather A/B (tile-aligned DMA
#      rewrite), fresh ARK headline.
#   B. Optimizer-moment dtype A/Bs (train-side; SKIP_SAMPLE avoids the
#      sampler compile): adam_m bf16 / adam_v bf16 / both.
#   C. wd-articles 40-epoch track_best_validity run + evaluations,
#      including the bf16-sampler validity gate (same checkpoint, fused
#      sampler head bf16+vb2048 vs default, evaluate --override).
#   D. wd-movies plain-SAIL 150-epoch run + t-SNE genre/interpolation
#      figures.
cd /root/repo
log(){ echo "[queue-r5 $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue_r5.log; }

bench_item(){
  local out="$1"; shift
  if [ -s "$out" ] && ! grep -q '"error"' "$out"; then
    log "skip ${out##*/} (already measured)"; return 0
  fi
  "$@" > "$out" 2> "${out%.json}.log"
  log "${out##*/} exit=$?"
}

archive(){
  mkdir -p runs_r5/ab
  local f
  for f in /tmp/r5_*.json; do
    [ -s "$f" ] || continue
    grep -q '"error"' "$f" && continue
    cp "$f" runs_r5/ab/
  done
  log "archived $(ls runs_r5/ab/*.json 2>/dev/null | wc -l) artifacts"
}

wait_tunnel(){
  until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    log "tunnel down; sleeping"; sleep 120
  done
}

log "r5 queue start"; wait_tunnel; log "tunnel up"

# ---- Stage A: the round-5 code-change measurements ------------------------
bench_item /tmp/r5_bench_tark_kv.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK python bench.py
bench_item /tmp/r5_embed_ab.json timeout 3600 python scripts/bench_embed_gather.py
bench_item /tmp/r5_bench_ark.json timeout 3600 python bench.py
archive; log "stage A done"

# ---- Stage A2: t-ARK sampler levers (the KV-layout fix measured +0.9% —
# refuted as THE gap; these probe arithmetic intensity + bf16 activations) --
bench_item /tmp/r5_bench_tark_1024.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_BATCH=1024 python bench.py
bench_item /tmp/r5_bench_tark_bf16act.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_DTYPE=bfloat16 python bench.py
bench_item /tmp/r5_bench_tark_1024_bf16.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_BATCH=1024 ARK_TPU_BENCH_SAMPLE_DTYPE=bfloat16 python bench.py
archive; log "stage A2 done"

# ---- Stage B: optimizer-moment dtype A/Bs (train side only) ----------------
bench_item /tmp/r5_bench_adam_m_bf16.json timeout 3600 env ARK_TPU_BENCH_SKIP_SAMPLE=1 ARK_TPU_BENCH_ADAM_M_DTYPE=bfloat16 python bench.py
bench_item /tmp/r5_bench_adam_v_bf16.json timeout 3600 env ARK_TPU_BENCH_SKIP_SAMPLE=1 ARK_TPU_BENCH_ADAM_V_DTYPE=bfloat16 python bench.py
bench_item /tmp/r5_bench_adam_mv_bf16.json timeout 3600 env ARK_TPU_BENCH_SKIP_SAMPLE=1 ARK_TPU_BENCH_ADAM_DTYPE=bfloat16 python bench.py
bench_item /tmp/r5_bench_train_ctl.json timeout 3600 env ARK_TPU_BENCH_SKIP_SAMPLE=1 python bench.py
bench_item /tmp/r5_bench_fadam_xla.json timeout 3600 env ARK_TPU_BENCH_SKIP_SAMPLE=1 ARK_TPU_BENCH_FADAM=xla python bench.py
archive; log "stage B done"

# ---- Stage C: wd-articles track_best_validity + bf16-sampler gate ----------
BV=$(ls runs_r5/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
if [ -z "$BV" ]; then
  log "wda_bv train (40 epochs, track_best_validity)"
  timeout 10800 python -m ark_tpu.experiments.train \
    --config scripts/tpu_queue/wda_bv.yaml \
    --checkpoint-dir runs_r5/wda_bv > /tmp/r5_wda_bv_train.log 2>&1
  log "wda_bv train exit=$?"
  BV=$(ls runs_r5/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
fi
BM=$(ls runs_r5/wda_bv/*/wd-articles_ARK_best_model.pt 2>/dev/null | head -1)
if [ -n "$BV" ]; then
  bench_item /tmp/r5_wda_bv_eval.json timeout 3600 python -m ark_tpu.experiments.evaluate \
    --checkpoint "$BV" --split test --num-samples 1000
fi
if [ -n "$BM" ]; then
  bench_item /tmp/r5_wda_bm_eval.json timeout 3600 python -m ark_tpu.experiments.evaluate \
    --checkpoint "$BM" --split test --num-samples 1000
  # the bf16-head validity gate: same checkpoint, winning sampler config
  bench_item /tmp/r5_wda_bm_eval_bf16samp.json timeout 3600 python -m ark_tpu.experiments.evaluate \
    --checkpoint "$BM" --split test --num-samples 1000 \
    --override fused_sample_dtype=bfloat16 \
    --override fused_sample_vblock=2048 --override fused_sample_rowchunk=256
else
  log "no wda_bv best_model checkpoint found"
fi
archive; log "stage C done"

# ---- Stage D: wd-movies plain-SAIL 150-epoch + figures ---------------------
SAIL_CKPT=$(ls runs_r5/wdm_sail/*/wd-movies_SAIL_best_model.pt 2>/dev/null | head -1)
if [ -z "$SAIL_CKPT" ]; then
  log "wdm_sail quality run (reference 150-epoch protocol)"
  python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/autoreg_wd-movies.yaml"))
cfg.update(model_type="SAIL", experiment_name="wdm_sail_r5")
yaml.safe_dump(cfg, open("/tmp/wdm_sail_r5.yaml", "w"))
PY
  timeout 14400 python -m ark_tpu.experiments.train --config /tmp/wdm_sail_r5.yaml \
    --checkpoint-dir runs_r5/wdm_sail > /tmp/r5_wdm_sail_train.log 2>&1
  log "wdm_sail train exit=$?"
fi
run_dir=$(ls -d runs_r5/wdm_sail/*/ 2>/dev/null | head -1)
if [ -n "$run_dir" ] && [ ! -d "$run_dir/figures" ]; then
  [ -f /tmp/wdm_sail_r5.yaml ] || python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/autoreg_wd-movies.yaml"))
cfg.update(model_type="SAIL", experiment_name="wdm_sail_r5")
yaml.safe_dump(cfg, open("/tmp/wdm_sail_r5.yaml", "w"))
PY
  log "latent analysis + t-SNE genre figures from $run_dir"
  timeout 7200 python -m ark_tpu.experiments.interpolation \
    --config /tmp/wdm_sail_r5.yaml --checkpoint-dir "$run_dir" \
    --directions 3 > /tmp/r5_wdm_sail_interp.log 2>&1
  log "wdm_sail interpolation exit=$?"
  if ls figures/*.pdf >/dev/null 2>&1; then
    mkdir -p "$run_dir/figures" && cp figures/*.pdf "$run_dir/figures/"
  fi
fi
archive; log "r5 queue done"
