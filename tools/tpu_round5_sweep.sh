#!/bin/sh
# Round-5 family-number sweep (VERDICT r4 item 8) + per-round on-chip gates.
# Sequential: each bench is its own process on the single tunnel chip.
set -x
mkdir -p bench_logs
python bench.py --preset sdxl-turbo --serving --requests 32 \
    > bench_logs/r5_sdxlturbo_serving.log 2>&1
python bench.py --preset sdxl --int8 --int8-vae \
    > bench_logs/r5_sdxl_int8_vae.log 2>&1
python bench.py --preset sdxl --int8 --int8-transformer --int8-vae \
    > bench_logs/r5_sdxl_int8_t_vae.log 2>&1
python tools/device_precision.py > bench_logs/r5_device_precision.log 2>&1
python tools/check_int8.py > bench_logs/r5_check_int8.log 2>&1
python tools/check_batch_invariance.py > bench_logs/r5_check_batch_inv.log 2>&1
echo SWEEP_DONE
