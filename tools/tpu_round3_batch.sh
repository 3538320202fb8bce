#!/bin/bash
# Round-3 pending TPU measurement batch — run as soon as the tunnel is back.
#
# Context: the flash two-stream schedule shipped mid-round with on-chip
# kernel A/Bs (-10% at every main self-attention shape) but the e2e family
# re-measures were blocked by a tunnel outage (NOTES_r3.md).  This script
# runs every pending number in one sitting, stall-resilient (each step is
# individually time-bounded; a hung PJRT handshake kills only that step).
#
# Usage: nohup bash tools/tpu_round3_batch.sh > /tmp/tpu_batch.log 2>&1 &
# Paste results into BENCHLOG.md (round-3 final table) and README.

set -u
cd "$(dirname "$0")/.."
RUN() {
  echo "=== $* ==="
  timeout 1500 "$@"
  echo "=== exit $? ==="
}

# 0. is the chip back?
timeout 180 python -c "import jax; print(jax.devices())" || {
  echo "TUNNEL STILL DOWN"; exit 1; }

# 1. headline + family table (pipelined timing, 2-stream flash now default)
RUN python bench.py --repeats 6
RUN python bench.py --repeats 6 --int8
RUN python bench.py --preset sd15 --repeats 4
RUN python bench.py --preset sd15 --repeats 4 --int8
RUN python bench.py --preset sd21 --repeats 3
RUN python bench.py --preset sd21 --repeats 3 --int8
RUN python bench.py --preset sdxl --repeats 2
RUN python bench.py --preset sdxl --repeats 2 --int8 --int8-transformer
RUN python bench.py --preset lcm-sd15 --repeats 8
RUN python bench.py --preset sdxl-turbo --repeats 4

# 2. new-feature overheads + the encoder-cache lever
RUN python bench.py --repeats 4 --controlnet
RUN python bench.py --preset sd15 --repeats 3 --controlnet
RUN python bench.py --repeats 4 --encoder-cache 2
RUN python bench.py --repeats 4 --encoder-cache 3
RUN python bench.py --preset sdxl --repeats 2 --encoder-cache 2
RUN python bench.py --preset ip2p --repeats 3
RUN python bench.py --preset sd15-inpaint --repeats 3
RUN python bench.py --preset sdxl-refiner --repeats 2

# 3. serving (BASELINE config 5)
RUN python bench.py --serving --batch 8 --preset lcm-sd15
RUN python bench.py --serving --batch 8

# 4. once-per-round on-chip gates (paste into BENCHLOG)
RUN python tools/device_precision.py
RUN python tools/check_int8.py
RUN python tools/check_batch_invariance.py

echo "ALL DONE"
