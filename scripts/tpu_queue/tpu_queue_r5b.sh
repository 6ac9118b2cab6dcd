#!/bin/bash
# Round-5 TPU measurement queue, part 2 (after the part-1 results landed,
# runs_r5/ab/TABLE.md):
#
#   E. Adam-moment dtype VALIDITY GATES (the round-2 protocol: 15-epoch
#      wd-articles, final-validation validity; f32 controls measured
#      96.5% r1 / 95.0% r2). m-only bf16 (+7.4% train) flips the default
#      only if it holds the ~95% line; v-only bf16 runs the same gate to
#      confirm the round-2 attribution of the bf16-BOTH collapse to nu.
#   F. Post-default-flip measurements: fresh headline (bf16 head + vb2048
#      sampler defaults), t-ARK with bf16 trunk stacked on the new sampler
#      defaults, the FIXED embed-gather A/B (two Mosaic lowering bugs
#      fixed), and the serve-daemon load test (VERDICT item 6).
#
# Restart-safe: every item is skipped when its artifact already landed.
cd /root/repo
log(){ echo "[queue-r5b $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue_r5b.log; }

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

mk_gate_cfg(){  # $1 = m|v, writes /tmp/wda_gate_$1.yaml
  python - "$1" <<'PY'
import sys, yaml
which = sys.argv[1]
cfg = yaml.safe_load(open("scripts/tpu_queue/wda_bv.yaml"))
cfg.update(num_epochs=15, track_best_validity=False,
           experiment_name=f"wda_adam_{which}_bf16_gate")
cfg[f"adam_{which}_dtype"] = "bfloat16"
yaml.safe_dump(cfg, open(f"/tmp/wda_gate_{which}.yaml", "w"))
PY
}

log "r5b queue start"; wait_tunnel; log "tunnel up"

# ---- Stage E: Adam-moment validity gates -----------------------------------
for which in m v; do
  GATE_DIR=runs_r5/adam_gate_$which
  CKPT=$(ls $GATE_DIR/*/wd-articles_ARK_best_model.pt 2>/dev/null | head -1)
  if [ -z "$CKPT" ]; then
    mk_gate_cfg $which
    log "adam_${which}_bf16 gate train (15 epochs)"
    timeout 7200 python -m ark_tpu.experiments.train \
      --config /tmp/wda_gate_$which.yaml \
      --checkpoint-dir $GATE_DIR > /tmp/r5_adam_gate_${which}_train.log 2>&1
    log "adam_${which}_bf16 gate train exit=$?"
  fi
done
archive; log "stage E done"

# ---- Stage F: post-flip measurements ---------------------------------------
bench_item /tmp/r5_bench_ark_v2.json timeout 3600 python bench.py
bench_item /tmp/r5_bench_tark_stack.json timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_DTYPE=bfloat16 python bench.py
bench_item /tmp/r5_embed_ab2.json timeout 3600 python scripts/bench_embed_gather.py
BV=$(ls runs_r5/wda_bv/*/wd-articles_ARK_best_validity.pt 2>/dev/null | head -1)
if [ -n "$BV" ]; then
  bench_item /tmp/r5_serve_load.json timeout 7200 python scripts/bench_serve.py --checkpoint "$BV"
fi
archive; log "r5b queue done"
