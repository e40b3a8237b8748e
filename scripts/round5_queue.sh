#!/bin/bash
# Round-5 quality-run queue (VERDICT r4 items 1, 4, 5): sequential room-
# protocol runs, each writing its artifact into docs/room_study/.
#   bash scripts/round5_queue.sh [stage ...]   (default: all stages)
# Stages:
#   reuse4        Replica room 1000f, tpu.sample_reuse=4   (generates dataset)
#   reuse2        Replica room 1000f, tpu.sample_reuse=2   (reuses dataset)
#   reuse4_seed1  seed-repeat of reuse4                    (reuses dataset)
#   scannet1000   ScanNet-layout room 1000f (coverage story vs run4's 300f)
#   scannet_imap  ScanNet iMAP config, 600f scene protocol (reuses dataset)
set -u
cd "$(dirname "$0")/.."
OUT=docs/room_study
LOG=/tmp/round5_queue
mkdir -p "$LOG"
STAGES=${@:-"reuse4 reuse2 reuse4_seed1 scannet1000 scannet_imap"}

run() {
  local name=$1; shift
  echo "=== [$(date +%H:%M:%S)] stage $name: $*" | tee -a "$LOG/queue.log"
  if python "$@" >"$LOG/$name.log" 2>&1; then
    echo "=== [$(date +%H:%M:%S)] stage $name OK" | tee -a "$LOG/queue.log"
  else
    echo "=== [$(date +%H:%M:%S)] stage $name FAILED (rc=$?) — see $LOG/$name.log" \
      | tee -a "$LOG/queue.log"
    return 1
  fi
}

for s in $STAGES; do
  case $s in
    reuse4)
      run reuse4 scripts/room_pipeline.py --work /tmp/vmap_room \
        --frames 1000 --objects 40 --sample_reuse 4 \
        --out $OUT/run5_px1_reuse4.json ;;
    reuse2)
      run reuse2 scripts/room_pipeline.py --work /tmp/vmap_room \
        --frames 1000 --objects 40 --sample_reuse 2 --skip_generate \
        --out $OUT/run5_px1_reuse2.json ;;
    reuse4_seed1)
      run reuse4_seed1 scripts/room_pipeline.py --work /tmp/vmap_room \
        --frames 1000 --objects 40 --sample_reuse 4 --train_seed 1 \
        --skip_generate --out $OUT/run5_px1_reuse4_seed1.json ;;
    scannet1000)
      # run4_scannet300_fixed protocol (25 objects, 640x480, same config)
      # extended to 1000 frames: the coverage-limited-completion hypothesis
      # predicts completion/r@5cm climb toward the Replica-layout numbers
      run scannet1000 scripts/room_pipeline.py --work /tmp/vmap_scannet \
        --frames 1000 --objects 25 --format ScanNet \
        --width 640 --height 480 \
        --config configs/ScanNet/scene0000_vmap.json --tag scannet1000 \
        --out $OUT/run5_scannet1000.json ;;
    scannet_imap)
      # the last empty config-family cell: ScanNet-layout data through the
      # shipped ScanNet iMAP config (single field), scene protocol at
      # grid 256 to match run4_imap600
      run scannet_imap scripts/room_pipeline.py --work /tmp/vmap_scannet \
        --frames 1000 --max_frames 600 --objects 25 --format ScanNet \
        --width 640 --height 480 --skip_generate --scene_only \
        --grid_dim 256 \
        --config configs/ScanNet/scene0000_imap.json --tag scannet_imap600 \
        --out $OUT/run5_scannet_imap600.json ;;
    reuse1)
      # reuse=1 control on THIS round's dataset generation + the jumbo-pool
      # px_block_bg demotion — makes the reuse A/B same-dataset,
      # same-code (run4_px1.json came from round 4's generation)
      run reuse1 scripts/room_pipeline.py --work /tmp/vmap_room \
        --frames 1000 --objects 40 --skip_generate \
        --out $OUT/run5_px1_reuse1.json ;;
    reuse4b)
      # rerun of reuse4 on the untiled-reuse fused path (the tiled path
      # hit an XLA:TPU backend fault at 512-slot pools; see core/step.py)
      run reuse4b scripts/room_pipeline.py --work /tmp/vmap_room \
        --frames 1000 --objects 40 --sample_reuse 4 --skip_generate \
        --out $OUT/run5_px1_reuse4.json ;;
    scannet_kf40)
      # keyframe-eviction hypothesis for the scannet1000 completion drop:
      # same dataset/config but a 40-slot keyframe buffer (40 kf candidates
      # at 1000f/step25 -> zero evictions); if completion recovers toward
      # run4's 300f numbers the 20-slot buffer churn is the cause
      run scannet_kf40 scripts/room_pipeline.py --work /tmp/vmap_scannet \
        --frames 1000 --objects 25 --format ScanNet \
        --width 640 --height 480 --skip_generate \
        --config configs/ScanNet/scene0000_vmap.json \
        --set model.keyframe_buffer_size=40 --tag scannet1000_kf40 \
        --out $OUT/run5_scannet1000_kf40.json ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== [$(date +%H:%M:%S)] queue done" | tee -a "$LOG/queue.log"
