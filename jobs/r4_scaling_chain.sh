#!/bin/bash
# Round-4 scaling measurement chain (VERDICT r3 items 1 and 3).
# Each bench_scaling.py run overwrites BENCH/scaling.json; copy it to a
# named artifact after each. Inputs are kept on /dev/shm and reaped at end.
set -x
cd /root/repo

python jobs/bench_scaling.py --n 3200000 --cores 8 32 --runs 1 --keep-input \
  && cp BENCH/scaling.json BENCH/scaling_8v32_n3200k.json
echo "=== chain: 8v32@3.2M done rc=$? ==="

python jobs/bench_scaling.py --n 1600000 --cores 4 16 --runs 2 --keep-input \
  && cp BENCH/scaling.json BENCH/scaling_4v16_n1600k_r4.json
echo "=== chain: 4v16@1.6M done rc=$? ==="

python jobs/bench_scaling.py --n 3200000 --cores 4 16 --runs 1 --keep-input \
  && cp BENCH/scaling.json BENCH/scaling_4v16_n3200k_r4.json
echo "=== chain: 4v16@3.2M done rc=$? ==="

rm -rf /dev/shm/scale_input_3200000_4242 /dev/shm/scale_input_1600000_4242
echo "=== chain complete ==="
