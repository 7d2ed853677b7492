#!/bin/bash
# Unattended hardware measurement session (docs/PERFORMANCE.md round-3
# lever list). Runs the staged knob sweeps in value order, logging each
# step to $LOGDIR, tolerant of individual-step failures (the tunneled
# TPU drops sessions). Kick with:  bash tools/hw_session.sh [LOGDIR]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/hw_session}
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/trtpu_jit_cache}

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/session.log"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/session.log"
}

# 1. Dragon layout/knob A/B (the flagship; paired payload is the new one)
step dragon_ab 2400 python tools/frame_ab.py dragon \
  base paired=1 pyr_group=8 planar_pyr=1 k_pairs=4 cap_t16=3

# 2. Helmet atlas row-width sweep (the 0.5-1M-row bundle atlas is in the
#    row-count-bound gather regime — the biggest expected helmet lever)
step helmet_ab 3600 python tools/frame_ab.py helmet \
  base row_elems=256 row_elems=512 row_elems=1024 row_elems=0 paired=1

# 2b. Smooth transmission (the slowest non-RT scene): its static level
#     set is LOD 0 — the PYRAMID'S BIGGEST per-level table (~130k rows
#     at GROUP=4) — so pyramid row grouping should matter most here
step smooth_ab 2400 python tools/frame_ab.py smooth \
  base pyr_group=8 pyr_group=32 planar_pyr=1 paired=1

# 3. RT ray-economics after the fat-leaf + unified-gather walk
step rt_base 1800 python tools/rt_bench.py
step rt_leaf32 1800 env TRTPU_LEAF_TRIS=32 python tools/rt_bench.py
step rt_unroll8 1800 env TRTPU_RT_UNROLL=8 python tools/rt_bench.py
step rt_p2sort 1800 env TRTPU_PHASE2_SORT=idx python tools/rt_bench.py

# 4. Stress-scene peel knobs
step stress_ab 2400 python tools/frame_ab.py stress \
  base peel=2 retile16=2 paired=1

# 5. Best-guess combined winners (re-run manually if singles disagree)
step dragon_combo 2400 python tools/frame_ab.py dragon \
  base "paired=1,pyr_group=8,cap_t16=3"
step helmet_combo 2400 python tools/frame_ab.py helmet \
  base "paired=1,row_elems=512"

# 6. Full bench with pass timing (current defaults) — the round's
#    reference point; RT scenes included (exact + half-res flag)
step bench_full 5400 python bench.py

echo "session done $(date -u +%H:%M:%S)" | tee -a "$LOGDIR/session.log"
