#!/bin/bash
# Queue 5 (chained on queue4): fused-sampler k_cands grid. The round-2
# tile table measured k=3 slightly ahead of k=4 at vblock 512; the optimum
# shifts with tile geometry, so re-measure at the shipped tile and at the
# queue4 candidate (2048, 256).
cd /root/repo
log(){ echo "[queue5 $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }
until grep -q "queue4 done" /tmp/tpu_queue.log 2>/dev/null; do sleep 120; done
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
