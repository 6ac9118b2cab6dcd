#!/bin/bash
# Round-5 TPU queue, part 5: prefix-windowed KV attention A/B on t-ARK.
#
#   I. t-ARK sampling with the landed segmented token scan (commit
#      20e4679), stacked on the bf16 trunk + new sampler defaults:
#        - auto (3 segments, the shipped default)   -> r5_bench_tark_win.json
#        - segments=1 (windowing off; same-session control for the
#          pre-window r5_bench_tark_stack 4928/4716) -> r5_bench_tark_nowin.json
#        - segments=6 (finer slicing: ~42% cache-traffic cut vs 33%,
#          at 2x the compiled bodies)               -> r5_bench_tark_win6.json
#
# VERDICT item 3 target: t-ARK sampling >= 0.8x the GRU headline
# (r5_bench_ark_v2: 6969.6 pipelined / 6328.6 single).
#
# Restart-safe: every item is skipped when its artifact already landed.
cd /root/repo
log(){ echo "[queue-r5e $(date +%H:%M:%S)] $*" >> /tmp/tpu_queue_r5e.log; }

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

log "r5e queue start"; wait_tunnel; log "tunnel up"

TARK="env ARK_TPU_BENCH_MODEL=t-ARK ARK_TPU_BENCH_SKIP_TRAIN=1 ARK_TPU_BENCH_SAMPLE_DTYPE=bfloat16"

bench_item /tmp/r5_bench_tark_win.json timeout 3600 \
  $TARK ARK_TPU_BENCH_ATTN_SEG=auto python bench.py
bench_item /tmp/r5_bench_tark_nowin.json timeout 3600 \
  $TARK ARK_TPU_BENCH_ATTN_SEG=1 python bench.py
bench_item /tmp/r5_bench_tark_win6.json timeout 3600 \
  $TARK ARK_TPU_BENCH_ATTN_SEG=6 python bench.py

mkdir -p runs_r5/ab
for f in /tmp/r5_bench_tark_win.json /tmp/r5_bench_tark_nowin.json \
         /tmp/r5_bench_tark_win6.json; do
  [ -s "$f" ] && ! grep -q '"error"' "$f" && cp "$f" runs_r5/ab/
done
log "r5e queue done"
