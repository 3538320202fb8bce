#!/bin/bash
# Refresh the BENCHLOG model-family table on the real chip (run under nohup;
# each line is a separate process so compiles reuse the persistent cache).
set -x
cd "$(dirname "$0")/.."
python bench.py --repeats 4                                   # headline
python bench.py --repeats 3 --img2img                         # config 2
python bench.py --repeats 3 --preset sd15                     # config 3
python bench.py --repeats 3 --sampler dpm++ --steps 20        # best-quality-throughput
python bench.py --repeats 2 --preset sd21 --image-size 768    # v-pred family
python bench.py --repeats 2 --preset sdxl                     # config 4
python bench.py --serving --preset lcm-sd15 --batch 8 --requests 32  # config 5 via engine
python bench.py --serving --batch 8 --requests 32 --steps 4 --sampler euler  # tiny-sd few-step serving
