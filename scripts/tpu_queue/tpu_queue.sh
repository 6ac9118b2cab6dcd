#!/bin/bash
cd /root/repo
log(){ echo "[queue $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue.log; }
log "waiting for tunnel"
until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  log "tunnel still down"; sleep 120
done
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
