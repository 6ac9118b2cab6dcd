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
#
# Restart-safe: items whose result file already exists (non-empty, no
# "error" key) are skipped, so relaunching after a machine restart resumes
# where the previous pass got to instead of re-paying completed runs.
cd /root/repo
log(){ echo "[queue $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }

# bench_item <result.json> <cmd...> — run unless already measured
bench_item(){
  local out="$1"; shift
  if [ -s "$out" ] && ! grep -q '"error"' "$out"; then
    log "skip ${out##*/} (already measured)"; return 0
  fi
  "$@" > "$out" 2> "${out%.json}.log"
  log "${out##*/} exit=$?"
}

# archive landed artifacts INTO THE REPO after every stage, so results
# survive /tmp (machine restart) and are commit-ready even if the tunnel
# comes back after the interactive session has ended.
archive(){
  mkdir -p runs_r4/ab
  local f
  for f in /tmp/bench_*.json /tmp/embed_ab.json /tmp/wda_bv_eval.json \
           /tmp/wda_bm_eval.json; do
    [ -s "$f" ] || continue
    grep -q '"error"' "$f" && continue
    cp "$f" runs_r4/ab/
  done
  python scripts/collect_ab_results.py --dir runs_r4/ab \
    > runs_r4/ab/TABLE.md 2>/dev/null || true
  log "archived $(ls runs_r4/ab/*.json 2>/dev/null | wc -l) artifacts to runs_r4/ab"
}

log "master queue: waiting for tunnel"
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  log "tunnel still down"; sleep 120
done
log "tunnel up"

# ---- Stage A: headline benches -------------------------------------------
bench_item /tmp/bench_ark.json timeout 3600 python bench.py
bench_item /tmp/bench_tark.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK python bench.py
bench_item /tmp/bench_ark_1024.json timeout 3600 env ARK_TPU_BENCH_SAMPLE_BATCH=1024 python bench.py
archive
log "stage A done"

# ---- Stage B: sampling strategy + embed-gather A/Bs ----------------------
bench_item /tmp/embed_ab.json timeout 3600 python scripts/bench_embed_gather.py
bench_item /tmp/bench_expmin.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_STRATEGY=expmin python bench.py
bench_item /tmp/bench_wbf16.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 python bench.py
bench_item /tmp/bench_expmin_wbf16.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_STRATEGY=expmin ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 python bench.py
bench_item /tmp/bench_gumbel_ctl.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 python bench.py
archive
log "stage B done"

# ---- Stage C: tile-geometry + k_cands grids ------------------------------
bench_item /tmp/bench_vb2048_rc256.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 python bench.py
bench_item /tmp/bench_vb2048_rc256_bf16.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 ARK_TPU_BENCH_SAMPLE_WDTYPE=bfloat16 python bench.py
bench_item /tmp/bench_vb2048_rc128.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=128 python bench.py
bench_item /tmp/bench_vb1024_rc256.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_VBLOCK=1024 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 python bench.py
bench_item /tmp/bench_k3.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=3 python bench.py
bench_item /tmp/bench_k2.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=2 python bench.py
bench_item /tmp/bench_k3_vb2048.json timeout 5400 env ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_KCANDS=3 ARK_TPU_BENCH_SAMPLE_VBLOCK=2048 ARK_TPU_BENCH_SAMPLE_ROWCHUNK=256 python bench.py
archive
log "stage C done"

# ---- Stage D: long quality runs (LAST — hours each) ----------------------
BV=$(ls runs_r4/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
if [ -z "$BV" ]; then
  log "wd-articles track_best_validity run (40 epochs, shipped protocol)"
  timeout 10800 python -m ark_tpu.experiments.train --config /tmp/wda_bv.yaml \
    --checkpoint-dir runs_r4/wda_bv > /tmp/wda_bv.log 2>&1
  log "wda_bv train exit=$?"
  BV=$(ls runs_r4/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
else
  log "skip wda_bv train (checkpoint exists)"
fi
if [ -n "$BV" ]; then
  bench_item /tmp/wda_bv_eval.json timeout 3600 python -m ark_tpu.experiments.evaluate \
    --checkpoint "$BV" --split test --num-samples 1000
  BM=$(ls runs_r4/wda_bv/*/wd-articles_ARK_best_model.pt 2>/dev/null | head -1)
  bench_item /tmp/wda_bm_eval.json timeout 3600 python -m ark_tpu.experiments.evaluate \
    --checkpoint "$BM" --split test --num-samples 1000
else
  log "no best_validity checkpoint found"
fi
archive
log "stage D1 done"

SAIL_CKPT=$(ls runs_r4/wdm_sail/*/wd-movies_SAIL_best_model.pt 2>/dev/null | head -1)
if [ -z "$SAIL_CKPT" ]; then
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
else
  log "skip wdm_sail train (checkpoint exists)"
fi
run_dir=$(ls -d runs_r4/wdm_sail/*/ 2>/dev/null | head -1)
if [ -n "$run_dir" ] && [ ! -d "$run_dir/figures" ]; then
  [ -f /tmp/wdm_sail_r4.yaml ] || python - <<'PY'
import yaml
cfg = yaml.safe_load(open("configs/autoreg_wd-movies.yaml"))
cfg.update(model_type="SAIL", experiment_name="wdm_sail_r4")
yaml.safe_dump(cfg, open("/tmp/wdm_sail_r4.yaml", "w"))
PY
  log "latent analysis + t-SNE genre figures from $run_dir"
  timeout 7200 python -m ark_tpu.experiments.interpolation \
    --config /tmp/wdm_sail_r4.yaml --checkpoint-dir "$run_dir" \
    --directions 3 > /tmp/wdm_sail_interp.log 2>&1
  log "wdm_sail interpolation exit=$?"
  # the probes write to CWD/figures; archive them with the run (the
  # round-3 runs_r3/wdm_tsail_fb/figures convention)
  if ls figures/*.pdf >/dev/null 2>&1; then
    mkdir -p "$run_dir/figures" && cp figures/*.pdf "$run_dir/figures/"
  fi
fi
log "stage D2 done"
archive
log "master queue done"
