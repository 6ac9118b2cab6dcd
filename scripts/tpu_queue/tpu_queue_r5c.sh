#!/bin/bash
# Round-5 TPU queue, part 3: sampler device traces (run after r5b exits —
# the launcher waits on /tmp/r5b_queue.pid so only one process touches the
# TPU). Captures one pipelined sampling dispatch per model family and
# aggregates device-op time (scripts/trace_sampler.py) — the evidence base
# for the remaining t-ARK 0.73x gap (VERDICT item 3).
cd /root/repo
log(){ echo "[queue-r5c $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue_r5c.log; }

if [ -f /tmp/r5b_queue.pid ]; then
  while kill -0 "$(cat /tmp/r5b_queue.pid)" 2>/dev/null; do sleep 60; done
fi
log "r5c start (r5b done)"

until timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  log "tunnel down; sleeping"; sleep 120
done

item(){
  local out="$1"; shift
  if [ -s "$out" ]; then log "skip ${out##*/}"; return 0; fi
  "$@" > "$out" 2> "${out%.txt}.log"
  log "${out##*/} exit=$?"
}

item /tmp/r5_trace_tark.txt timeout 5400 env ARK_TPU_BENCH_MODEL=t-ARK \
  ARK_TPU_BENCH_SAMPLE_DTYPE=bfloat16 \
  python scripts/trace_sampler.py --trace-dir /tmp/tark_trace
item /tmp/r5_trace_ark.txt timeout 5400 \
  python scripts/trace_sampler.py --trace-dir /tmp/ark_trace
mkdir -p runs_r5/traces
cp /tmp/r5_trace_*.txt runs_r5/traces/ 2>/dev/null
log "r5c done"
