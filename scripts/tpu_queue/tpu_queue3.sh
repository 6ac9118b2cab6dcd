#!/bin/bash
cd /root/repo
log(){ echo "[queue3 $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }
until grep -q "queue2 done" /tmp/tpu_queue.log 2>/dev/null; do sleep 120; done
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
