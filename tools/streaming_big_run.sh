#!/bin/bash
# Full-size-dataset streaming GAN training with chunked resume (round-3
# VERDICT item 6): 3,800 train samples (the real MIT-CGH-4K count,
# reference README.md:28-38) streamed from host memmaps in 1-epoch process
# chunks — each chunk is a FRESH process that resumes from the shared
# resume_dir via --start_epoch (no O(epochs^2) replay), bounding the axon
# relay's per-H2D-buffer pinning leak.  3 restarts total.  Reuses the
# config-of-record stage-1/2 pretrained parts (same workflow as the batch-8
# throughput quality run, BASELINE.md).
#
# Usage: bash tools/streaming_big_run.sh [out_dir]
set -e
OUT=${1:-output/quality_run_big}
mkdir -p "$OUT"
for part in rgbd2ap.msgpack ap2poh.msgpack; do
  [ -f "$OUT/$part" ] || cp "output/quality_run/$part" "$OUT/$part"
done
# persistent compilation cache: every chunk is a fresh process on identical
# shapes — without this each restart pays the full ~5 min trace+compile
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
EPOCHS_PER_CHUNK=1
TOTAL=4
for ((start = 0; start < TOTAL; start += EPOCHS_PER_CHUNK)); do
  end=$((start + EPOCHS_PER_CHUNK))
  echo "=== chunk: epochs $start -> $end (fresh process) ==="
  python tools/quality_run.py \
    --data data/synth384_big --out "$OUT" \
    --train_num 3800 --val_num 100 \
    --streaming --skip_stage1 --skip_stage2 --skip_eval \
    --batch_size 8 --data_dtype bfloat16 \
    --start_epoch "$start" --gan_epochs "$end" --info_interval 100000
done
echo "=== final eval ==="
python tools/eval_quality.py --data data/synth384_big --run_dir "$OUT" \
  --val_num 100 --dtype bfloat16 --samples 3
