#!/bin/bash
# Round-5 measurement queue (VERDICT r4 next-round items). One TPU chip →
# strictly serial. Each job logs to its run dir; a failed job does not
# block the queue. Invoke from the repo root:
#   bash benchmarks/run_r5_queue.sh & echo $! > /tmp/r5_queue.pid
cd "$(dirname "$0")/.." || exit 1

run() {
  local label="$1" log="$2"; shift 2
  echo "=== [$(date +%H:%M:%S)] $label -> $log" | tee -a runs/r5_queue.log
  "$@" >> "$log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $label exit=$?" | tee -a runs/r5_queue.log
}

# 1. MH-GAN pool-fair re-score at the ImageNet-64 it10000 flagship
#    (VERDICT r4 item 3; other plain finals stay cached).
run "converged:mh-refair" runs/imagenet64_conv/run_r5a.log \
  python benchmarks/quality_converged.py --preset imagenet64 \
    --iters 10000 --gens plain --arms mhgan --out runs/imagenet64_conv

# 2. Crossover: it8000 depth + full-matrix arm backfill at the cached
#    depths (VERDICT r4 items 2b + 4). Same protocol as round 4.
run "crossover:it8000+arms" runs/celeba_crossover/run_r5.log \
  python benchmarks/quality_crossover.py --preset celeba \
    --depths 500 1000 2000 4000 8000 --ks 5 10 20 \
    --rates 0.005 0.01 0.03 --pool 10000 --out runs/celeba_crossover

# 3. Converged-boundary replication on a second preset: CelebA-64 it8000
#    (VERDICT r4 item 1). Reuses the crossover trajectory's it8000
#    snapshot and its (protocol-identical, deterministic) tuning grid.
mkdir -p runs/celeba_conv/plain/ckpts
cp -n runs/celeba_crossover/it8000/ckpts/ckpt_00008000.msgpack \
      runs/celeba_crossover/it8000/ckpts/config.json \
      runs/celeba_conv/plain/ckpts/ 2>/dev/null
cp -n runs/celeba_crossover/grid_it8000.jsonl \
      runs/celeba_conv/grid_plain.jsonl 2>/dev/null
run "converged:celeba-it8000" runs/celeba_conv/run_r5.log \
  python benchmarks/quality_converged.py --preset celeba --iters 8000 \
    --gens plain --ks 5 10 20 --rates 0.005 0.01 0.03 \
    --out runs/celeba_conv

# 4. Intersection-protocol intra-FID re-run (VERDICT r4 item 2a) —
#    deterministically retrains cond_it2000 first (weights are wiped
#    between rounds; sidecar-driven bitwise retrain, verified round 4).
run "intra1000" runs/imagenet64_q3/run_r5_intra.log \
  python benchmarks/quality_intra1000.py

# 5. EMA converged grid: close the rate-low edge (VERDICT r4 weak 6) and
#    fill the 6 missing EMA arms of the matrix. A tuned-cell change
#    auto-invalidates the stale collab-family finals (protocol stamp).
run "converged:ema-extend" runs/imagenet64_conv/run_r5b.log \
  python benchmarks/quality_converged.py --preset imagenet64 \
    --iters 10000 --gens ema --ks 2 5 10 20 \
    --rates 0.001 0.005 0.01 0.03 --extend-grid 3 \
    --out runs/imagenet64_conv

echo "=== [$(date +%H:%M:%S)] queue done" | tee -a runs/r5_queue.log
