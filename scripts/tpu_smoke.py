"""Compiled-kernel numerics smoke on real TPU hardware.

Interpret mode skips Mosaic tiling/layout checks (r1 lesson: a chunk<128
tiling bug shipped past the CPU suite), so compiled-kernel parity must be
re-proven on the chip after any kernel change.

The oracle is the chunked-XLA scan on **CPU**, where fp32 dots are true
fp32. On TPU, BOTH implementations' fp32 dots lose precision to MXU
operand handling (XLA default precision truncates fp32 dot operands to
bf16; Mosaic emulates fp32 in bf16 passes), so TPU-pallas vs TPU-chunked
drift — first seen as a 9.1e-3 dt-grad "failure" in the r4 queue — mostly
measures the *reference's* error, not the kernel's. This script therefore
grades each TPU path against the CPU oracle and gates the kernel at
"no worse than the chunked-XLA path it replaces, plus fp32 headroom".

Usage:
    python scripts/tpu_smoke.py            # run both phases (CPU via child)
    python scripts/tpu_smoke.py --oracle   # CPU phase only (writes npz)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

NPZ = "/tmp/tpu_smoke_oracle.npz"
SHAPE = dict(B=2, L=512, H=8, P=64, G=1, N=128)
CHUNKS = (256, 384)
NAMES = "x dt A B C D".split()


def make_inputs():
    rng = np.random.default_rng(0)
    B, L, H, P, G, N = (SHAPE[k] for k in "BLHPGN")
    return dict(
        x=rng.standard_normal((B, L, H, P)).astype(np.float32),
        dt=rng.uniform(0.01, 0.6, (B, L, H)).astype(np.float32),
        A=-rng.uniform(0.5, 1.5, (H,)).astype(np.float32),
        B=(rng.standard_normal((B, L, G, N)) / np.sqrt(N)).astype(np.float32),
        C=(rng.standard_normal((B, L, G, N)) / np.sqrt(N)).astype(np.float32),
        D=rng.standard_normal((H,)).astype(np.float32),
    )


def chunked_grads(jax, jnp, inp, q):
    from omnimamba_tpu.ops.ssd_chunked import ssd_chunked

    args = tuple(jnp.asarray(inp[n]) for n in NAMES)

    def loss(*a):
        return jnp.sum(jnp.square(ssd_chunked(*a, chunk_size=q)[0]))

    return jax.jit(jax.grad(loss, argnums=tuple(range(6))))(*args)


def run_oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    inp = make_inputs()
    out = {}
    for q in CHUNKS:
        g = chunked_grads(jax, jnp, inp, q)
        for n, a in zip(NAMES, g):
            out[f"{n}_{q}"] = np.asarray(a)
    np.savez(NPZ, **out)
    print(f"oracle written: {NPZ}")


def run_tpu():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/omnimamba_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad

    oracle = np.load(NPZ)
    inp = make_inputs()
    args = tuple(jnp.asarray(inp[n]) for n in NAMES)
    ok = True
    for q in CHUNKS:

        def loss(*a):
            return jnp.sum(
                jnp.square(ssd_pallas_ad(*a, chunk_size=q, interpret=False)[0])
            )

        gp = jax.jit(jax.grad(loss, argnums=tuple(range(6))))(*args)
        gc = chunked_grads(jax, jnp, inp, q)
        for n, p, c in zip(NAMES, gp, gc):
            ref = oracle[f"{n}_{q}"]
            scale = np.abs(ref).max() + 1e-9
            ep = np.abs(np.asarray(p) - ref).max() / scale
            ec = np.abs(np.asarray(c) - ref).max() / scale
            # gate: the kernel must not be materially worse than the
            # chunked-XLA path it replaces (both pay TPU fp32-dot tax),
            # with 1e-3 absolute headroom for exp/accumulation-order noise
            lim = max(2.0 * ec + 1e-3, 2e-3)
            tag = "OK" if ep <= lim else "FAIL"
            if ep > lim:
                ok = False
            print(
                f"Q={q} {n:>2}: pallas-vs-cpu {ep:.2e}  "
                f"chunked(tpu)-vs-cpu {ec:.2e}  limit {lim:.2e}  {tag}"
            )
    if not ok:
        raise SystemExit("TPU kernel smoke FAILED")
    print("TPU kernel smoke OK (Q=256, Q=384)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", action="store_true", help="CPU phase only")
    args = ap.parse_args()
    if args.oracle:
        run_oracle()
        return
    # CPU oracle in a child (jax_platforms must be set before backend init)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--oracle"],
        check=True, env=env,
    )
    run_tpu()


if __name__ == "__main__":
    main()
