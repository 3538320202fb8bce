#!/bin/bash
# Round-4 int8-variant sweep (VERDICT r3 items 4+5): LCM few-step with int8
# UNet/VAE (the trace says VAE decode is ~15 ms of the 59 ms image), tiny-sd
# int8+transformer re-measure post-2-stream-kernel, tiny-sd int8+vae, and
# SD 2.1 toward >= 1.0 img/s.  Run: nohup bash tools/tpu_round4_int8_sweep.sh
# > /tmp/r4_int8_sweep.log 2>&1 &
set -x
cd /root/repo
run() { timeout 900 python bench.py "$@"; echo "rc=$?"; }

run --preset lcm-sd15 --int8
run --preset lcm-sd15 --int8 --int8-vae
run --preset tiny-sd --int8 --int8-transformer
run --preset tiny-sd --int8 --int8-vae
run --preset tiny-sd --int8 --int8-transformer --int8-vae
run --preset sd21 --int8 --int8-vae
echo SWEEP-DONE
