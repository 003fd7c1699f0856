"""Minimize the "TPU-compiler crash": proj_xbd remat at B>12.

Round-2 finding (train/trainer.py auto-remat table): the 1.3B t2i train
step with remat="proj_xbd" compiles and runs at B<=12 but was reported to
crash the XLA TPU compiler deterministically at B=16.

RESOLVED (round 3, this script): it is not a compiler fault — B=16 x 48
layers proj_xbd exhausts HBM at buffer assignment (the error payload is
XLA's allocation dump, full of `.remat_compressed` temps), and the axon
remote-compile helper surfaces that as an opaque HTTP-500/exit-1.
Measured: B=16/48L fails; B=14/48L, B=16/24L, and B=16 "proj" all
compile. The auto-remat table's fall-back to full remat at B=16 is the
correct policy, not a workaround.

Modes:

  python scripts/repro_projxbd_crash.py sweep       # find min crashing shape
  python scripts/repro_projxbd_crash.py variants    # knobs at the min shape

Each probe compiles the train step AOT (`.lower().compile()`) in a
subprocess so a compiler abort kills the probe, not the sweep.
"""

from __future__ import annotations

import argparse
import subprocess
import sys

PROBE = r"""
import sys
sys.path.insert(0, "/root/repo")
import dataclasses, json
import jax, jax.numpy as jnp
import numpy as np

batch, n_layer, remat, donate = json.loads(sys.argv[1])
jax.config.update("jax_compilation_cache_dir", "/tmp/omnimamba_probe_cache")

from omnimamba_tpu.config import MambaConfig, TrainConfig, VQConfig, VisionConfig
from omnimamba_tpu.models.omnimamba import OmniMambaModel, init_omnimamba
from omnimamba_tpu.train.trainer import create_train_state, make_train_step

cfg = MambaConfig(mmu_task=False, n_layer=n_layer)
model = OmniMambaModel(cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=VQConfig(), sptids={})
tcfg = TrainConfig(stage="finetune", t2i_task=True, mmu_task=False,
                   scan_impl="pallas_ad", remat=remat)
params = init_omnimamba(jax.random.PRNGKey(0), model, dtype=jnp.bfloat16, with_vq=False)
state, tx = create_train_state(params, tcfg)
step_fn = make_train_step(model, tx, tcfg, dtype=jnp.bfloat16, donate=donate)
rng = np.random.default_rng(0)
batch_d = {"t2i_flow": {
    "inputs": jnp.asarray(rng.integers(0, 16384, (batch, 256)), jnp.int32),
    "caption_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 73)), jnp.int32),
}}
key = jax.random.PRNGKey(1)
lowered = step_fn.lower(state, batch_d, key)
lowered.compile()
print("COMPILED-OK")
"""


def probe(batch, n_layer, remat="proj_xbd", donate=True, timeout=1500):
    """Returns 'ok' | 'crash' | 'oom' | 'timeout'."""
    import json

    r = subprocess.run(
        [sys.executable, "-c", PROBE, json.dumps([batch, n_layer, remat, donate])],
        capture_output=True, text=True, timeout=timeout,
    )
    out = r.stdout + r.stderr
    if "COMPILED-OK" in out:
        return "ok"
    # the axon remote-compile helper wraps XLA's buffer-assignment HBM
    # exhaustion in an opaque HTTP-500/exit-1; the payload still carries
    # the allocation dump — classify it as OOM, not a compiler fault
    if (
        "RESOURCE_EXHAUSTED" in out
        or "Out of memory" in out
        or "Allocation type: HLO temp" in out
    ):
        return "oom"
    return f"crash(rc={r.returncode})"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["sweep", "variants", "one"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layers", type=int, default=48)
    ap.add_argument("--remat", default="proj_xbd")
    args = ap.parse_args()

    if args.mode == "one":
        print(args.batch, args.layers, args.remat,
              probe(args.batch, args.layers, args.remat))
        return

    if args.mode == "sweep":
        # batch sweep at full depth, then depth sweep at the smallest
        # crashing batch
        crash_b = None
        for b in (13, 14, 16):
            s = probe(b, 48)
            print(f"B={b} layers=48: {s}", flush=True)
            if s.startswith("crash"):
                crash_b = b
                break
        if crash_b is None:
            print("no crash reproduced at B<=16/48L")
            return
        lo, hi = 1, 48  # min layers that still crash at crash_b
        while lo < hi:
            mid = (lo + hi) // 2
            s = probe(crash_b, mid)
            print(f"B={crash_b} layers={mid}: {s}", flush=True)
            if s.startswith("crash"):
                hi = mid
            else:
                lo = mid + 1
        print(f"MINIMAL: B={crash_b} layers={lo} crashes; layers={lo-1} compiles")
        return

    # variants at the reported crash shape
    for name, kw in [
        ("proj_xbd/donate", dict(remat="proj_xbd", donate=True)),
        ("proj_xbd/no-donate", dict(remat="proj_xbd", donate=False)),
        ("proj (save z too)", dict(remat="proj")),
        ("full remat", dict(remat=True)),
        ("proj_ssd", dict(remat="proj_ssd")),
    ]:
        s = probe(args.batch, args.layers, **kw)
        print(f"{name:24s} B={args.batch} layers={args.layers}: {s}", flush=True)


if __name__ == "__main__":
    main()
