#!/bin/bash
# Round-4 follow-up TPU queue — run AFTER scripts/r4_measure.sh exits.
# 1. the real compiled-kernel numerics gate (CPU-oracle based; the inline
#    r4_measure smoke graded pallas against TPU-chunked, whose own MXU
#    default-precision error trips the tolerance — see scripts/tpu_smoke.py)
# 2. re-price scaled-int8 SSM state with the SQUEEZED scale layout
#    (ops/quant.quantize_ssm_state r4 fix: keepdims (B,H,P,1) fp32 scale was
#    lane-padded to 128 in HBM = ~201 MB/layer carried traffic at B=96)
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* ==="; timeout 2400 "$@" > /tmp/r4f_$name.log 2>&1; echo "rc=$? ($name)"; }

run smoke2 python scripts/tpu_smoke.py
run state_int8_v2 python scripts/profile_train.py decode --batch 96 --tokens 256 --int8 --state-int8
run state_int8_v2_b48 python scripts/profile_train.py decode --batch 48 --tokens 256 --int8 --state-int8
echo "FOLLOWUP DONE"
