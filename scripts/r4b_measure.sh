#!/bin/bash
# Round-4 (resumed) TPU measurement queue — runs after the POPE 9k soak.
# Ordered by value density:
# 1. squeezed-scale int8 SSM state re-price (ops/quant.quantize_ssm_state
#    now stores the scale as (B,H,P), not lane-padded (B,H,P,1); the first
#    r4 pricing lost on exactly that padded traffic — this is the honest
#    re-measurement the quant.py docstring still owes). If it WINS, also
#    re-price the CFG path (whose int8-state variant OOM'd on the padded
#    scale).
# 2. Pallas fused-norm train-step A/B (OMNIMAMBA_PALLAS_NORM=1) — the r3
#    trace priced norms at ~33 ms of the 343 ms step; the kernels were
#    coded in r4 but never measured inside the step.
# 3. smoke: compiled-kernel numerics vs the CPU oracle (the real gate).
# 4. MMMU-shaped synthetic eval end-to-end at 1.3B (VERDICT r3 item 6).
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* ==="; timeout 2400 "$@" > /tmp/r4b_$name.log 2>&1; echo "rc=$? ($name)"; tail -2 /tmp/r4b_$name.log; }

run dec_b96_int8 python scripts/profile_train.py decode --batch 96 --tokens 256 --int8
run dec_b96_int8_state python scripts/profile_train.py decode --batch 96 --tokens 256 --int8 --state-int8
# anchor to the DECODE line and take the first integer match only (ADVICE r4:
# a second 'tok/s' line or non-integer format must not abort the gate)
base=$(grep '^DECODE' /tmp/r4b_dec_b96_int8.log | grep -oE '[0-9]+ tok/s' | head -1 | grep -oE '[0-9]+')
i8=$(grep '^DECODE' /tmp/r4b_dec_b96_int8_state.log | grep -oE '[0-9]+ tok/s' | head -1 | grep -oE '[0-9]+')
echo "b96 decode: bf16-state=$base int8-state=$i8"
if [ -n "$i8" ] && [ -n "$base" ] && [ "$i8" -gt "$base" ]; then
  run cfg_int8state python scripts/price_cfg_t2i.py --images 48 --cache-dtype int8
else
  echo "skipping cfg re-price: int8-state did not beat bf16-state (or parse failed: base='$base' i8='$i8')"
fi
run step_b8 python scripts/profile_train.py step --batch 8
run step_b8_pnorm env OMNIMAMBA_PALLAS_NORM=1 python scripts/profile_train.py step --batch 8
run smoke python scripts/tpu_smoke.py
run mmmu_512 python scripts/eval_mmu.py --protocol mmmu --synthetic 512 --questions-per-image 4 --max-new-tokens 16
echo "R4B QUEUE DONE"
