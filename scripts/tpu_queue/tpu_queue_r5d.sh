#!/bin/bash
# Round-5 TPU queue, part 4:
#
#   G. Re-run the adam_v bf16 validity gate (the r5b attempt died on a
#      transient TPU FailedPrecondition at epoch 1 — attribution evidence
#      for the round-2 bf16-BOTH collapse, not a default candidate).
#   H. Fresh full headline bench under the NEW defaults (bf16 sampler head
#      + vb2048 tile + bf16 Adam first moment): the BENCH_r05 expectation
#      is train ~4360 g/s (the +7.4% m-flip A/B) on top of the 6969/6329
#      sampling numbers from r5_bench_ark_v2.
#
# Restart-safe: every item is skipped when its artifact already landed.
cd /root/repo
log(){ echo "[queue-r5d $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue_r5d.log; }

bench_item(){
  local out="$1"; shift
  if [ -s "$out" ] && ! grep -q '"error"' "$out"; then
    log "skip ${out##*/} (already measured)"; return 0
  fi
  "$@" > "$out" 2> "${out%.json}.log"
  log "${out##*/} exit=$?"
}

wait_tunnel(){
  until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    log "tunnel down; sleeping"; sleep 120
  done
}

log "r5d queue start"; wait_tunnel; log "tunnel up"

# ---- Stage G: adam_v bf16 gate retry ---------------------------------------
GATE_DIR=runs_r5/adam_gate_v
CKPT=$(ls $GATE_DIR/*/wd-articles_ARK_best_model.pt 2>/dev/null | head -1)
if [ -z "$CKPT" ]; then
  python - <<'PY'
import yaml
cfg = yaml.safe_load(open("scripts/tpu_queue/wda_bv.yaml"))
cfg.update(num_epochs=15, track_best_validity=False,
           experiment_name="wda_adam_v_bf16_gate")
cfg["adam_v_dtype"] = "bfloat16"
yaml.safe_dump(cfg, open("/tmp/wda_gate_v.yaml", "w"))
PY
  log "adam_v_bf16 gate train retry (15 epochs)"
  timeout 7200 python -m ark_tpu.experiments.train \
    --config /tmp/wda_gate_v.yaml \
    --checkpoint-dir $GATE_DIR > /tmp/r5_adam_gate_v_train2.log 2>&1
  log "adam_v_bf16 gate train exit=$?"
fi
log "stage G done"

# ---- Stage H: headline bench under the full new defaults --------------------
bench_item /tmp/r5_bench_ark_v3.json timeout 3600 python bench.py
mkdir -p runs_r5/ab
for f in /tmp/r5_bench_ark_v3.json; do
  [ -s "$f" ] && ! grep -q '"error"' "$f" && cp "$f" runs_r5/ab/
done
log "r5d queue done"
