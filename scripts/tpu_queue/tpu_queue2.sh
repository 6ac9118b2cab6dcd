#!/bin/bash
cd /root/repo
log(){ echo "[queue2 $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }
until grep -q "queue done" /tmp/tpu_queue.log 2>/dev/null; do sleep 120; done
log "bench queue done; wd-articles track_best_validity run (40 epochs, shipped protocol)"
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
