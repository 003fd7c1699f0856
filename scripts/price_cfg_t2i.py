"""Price CFG dual-stream T2I throughput for a given SSM-state cache dtype.

The r3 ceiling analysis (README) puts CFG T2I at 94% of the B=96 decode DMA
ceiling; the only lever left is state traffic. The first scaled-int8 state
layout OOM'd here (keepdims (B,H,P,1) fp32 scale lane-padded to 128 =
~201 MB/layer); ops/quant.quantize_ssm_state now stores the scale squeezed.
This script re-prices the CFG path with that layout:

    python scripts/price_cfg_t2i.py --images 48 --cache-dtype int8
    python scripts/price_cfg_t2i.py --images 48 --cache-dtype auto   # control

Reference role: the cfg_scale branch of t2i generation
(/root/reference/models/stage2/omnimamba.py:311-337).
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=48)
    p.add_argument("--cache-dtype", default="int8", choices=["auto", "int8"])
    p.add_argument("--iters", type=int, default=4)  # 2-sample means were jitter-prone (ADVICE r4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("OMNIMAMBA_JAX_CACHE", "/tmp/omnimamba_jax_cache"),
    )

    from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
    from omnimamba_tpu.models.backbone import init_backbone
    from omnimamba_tpu.models.omnimamba import OmniMambaModel, t2i_generate
    from omnimamba_tpu.models.vq import init_vq
    from omnimamba_tpu.ops.quant import quantize_decode_params
    from omnimamba_tpu.ops.sampling import SampleParams
    from omnimamba_tpu.utils.profiling import hard_sync

    cfg = MambaConfig()
    vq_cfg = VQConfig()
    model = OmniMambaModel(cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=vq_cfg, sptids={})
    t0 = time.time()
    params = {
        "mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        "vq": init_vq(jax.random.PRNGKey(1), vq_cfg, dtype=jnp.bfloat16),
    }
    params = quantize_decode_params(params)  # int8 weights = best known CFG config
    print(f"init in {time.time()-t0:.0f}s", file=sys.stderr)

    n = args.images
    rng = np.random.default_rng(0)
    cond = rng.integers(0, cfg.vocab_size, (n, 72))
    # NOTE: the "uncond" half is n copies of the first conditional caption —
    # placeholder content valid ONLY for throughput pricing (same shapes and
    # dispatch as a real null prompt); outputs are meaningless for fidelity.
    ids = jnp.asarray(np.concatenate([cond, np.tile(cond[:1], (n, 1))]), jnp.int32)

    gen = jax.jit(
        lambda p, i: t2i_generate(
            p, model, i, cfg_scale=7.5,
            sample=SampleParams(top_k=2, temperature=1.0),
            key=jax.random.PRNGKey(0), decode_image=True,
            cache_dtype=args.cache_dtype,
        )[0]
    )
    t0 = time.time()
    imgs = gen(params, ids)
    hard_sync(imgs)
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.iters):
        imgs = gen(params, ids)
    hard_sync(imgs)
    dt = (time.time() - t0) / args.iters
    print(
        f"CFG7.5 T2I {n} imgs ({2*n} streams) int8w state={args.cache_dtype}: "
        f"{n/dt:.2f} img/s"
    )


if __name__ == "__main__":
    main()
