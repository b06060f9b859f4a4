#!/bin/bash
# Round-3 TPU measurement campaign (CLAUDE.md queue + VERDICT r2 item 2).
# Run UNATTENDED as soon as the axon tunnel answers; serial, one process at
# a time (one process owns the chip).  NO inner timeouts on the big points:
# a kill mid-Mosaic-compile wedges the tunnel for ~15 min.
#
# Usage: bash scripts/run_measurement_queue.sh [results_dir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/lcpc_r3_measure}
mkdir -p "$OUT"
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/root/.cache/lcpc_tpu_xla_cache

run() {  # run <name> <cmd...>
  local name=$1; shift
  if [ -e "$OUT/$name.ok" ]; then echo "== $name: already done, skip"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S) =="
  "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$OUT/$name.ok"; else echo "rc=$rc" > "$OUT/$name.fail"; fi
  echo "== $name done rc=$rc $(date -u +%H:%M:%S)"
  tail -3 "$OUT/$name.log"
  return 0
}

# 0. liveness gate: bail out (15 min) if the tunnel is dead so the caller
#    can re-arm; uses only a cached-trivial computation (safe to kill).
#    The per-process session warmup readback alone is 50-850 s.
timeout 900 python -c "
import jax, jax.numpy as jnp
print(jax.devices()); print(int(jnp.arange(8).sum()))" > "$OUT/liveness.log" 2>&1
if [ $? -ne 0 ]; then echo "TUNNEL DEAD (liveness gate failed)"; exit 9; fi
echo "tunnel alive"

# 1. kernel + packed-expander validation (exits nonzero on any mismatch)
run validate python scripts/tpu_validate_bench.py

# 2. headline bench (2^20) — keeps BENCH_rN.json comparable
run bench20 python bench.py

# 3. ligero prove/verify at 2^20,21 (fused verifier + uint16 packing)
run proto_ligero env LCPC_PROTO_LOG2S=20,21 python scripts/bench_protocol.py
run profile_proto python scripts/profile_protocol.py 20

# 4. brakedown commit+p/v at 2^21 and the reference flagship 2^25
#    (ref 64c: commit 2.24 s / prove 0.281 / verify 0.551, 50.3 MB)
run proto_brakedown21 env LCPC_PROTO_CODE=brakedown LCPC_PROTO_LOG2S=21 LCPC_PROTO_ITERS=2 python scripts/bench_protocol.py
run proto_brakedown25 env LCPC_PROTO_CODE=brakedown LCPC_PROTO_LOG2S=25 LCPC_PROTO_ITERS=2 python scripts/bench_protocol.py

# 5. 2^25/2^26 streamed ligero commit (2^26 = host-coeff mode; compiles 3
#    batch shapes, ~10 min first time — NO timeout)
run bench25 env LCPC_BENCH_LOG2=25 LCPC_BENCH_ITERS=2 python bench.py
run bench26 env LCPC_BENCH_LOG2=26 LCPC_BENCH_ITERS=2 python bench.py

# 6. MXU digit-matmul viability probe (NTT-as-matmul groundwork)
run mxu_probe python scripts/microbench_mxu.py

# 7. ligero prove/verify at the reference flagship 2^25 (streamed commit,
#    out-of-core prove) — ref 64c: 0.140 s / 0.075 s
run proto_ligero25 env LCPC_PROTO_LOG2S=25 LCPC_PROTO_ITERS=2 python scripts/bench_protocol.py

echo "ALL DONE $(date -u)"; ls "$OUT"
