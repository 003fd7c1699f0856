"""Root-cause the r4 B=96 serving regression (VERDICT r4 weak #1).

BENCH_r03 measured mmu_best_b96 = 3568 tok/s; BENCH_r04 measured 1690 with
the SAME section code. The r4 bench restructure moved the CFG T2I section
(96-stream dual-path decode + VQ decoder, a large compiled TPU program)
BEFORE mmu_best_b96. TPU executables are loaded into HBM; B=96 decode sits
right at an HBM cliff (r3 sweep: 3568 @96 -> 2079 @128), so extra resident
bytes can push the state-streaming working set over the cliff.

This script measures B=96 decode (int8 weights + bf16 state):
  phase A: clean — only params+qparams resident (r3 ordering);
  phase B: after compiling AND running the CFG T2I program (r4 ordering).
If A ~3500 and B ~1700, the regression is bench-section ordering, not a
decode-path change.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[-1]
    return np.asarray(leaf.ravel()[-1])


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

    from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.models.omnimamba import OmniMambaModel, t2i_generate
    from omnimamba_tpu.models.vq import init_vq
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
    from omnimamba_tpu.ops.sampling import SampleParams

    cfg = MambaConfig()
    vq_cfg = VQConfig()
    model = OmniMambaModel(
        cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=vq_cfg, sptids={}
    )
    t0 = time.time()
    params = {
        "mamba": init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        "vq": init_vq(jax.random.PRNGKey(1), vq_cfg, dtype=jnp.bfloat16),
    }
    # keep the bf16 params alive too — both bench versions (r3 and r4) do
    qparams = fuse_in_proj(quantize_decode_params(params))
    print(f"init+quantize: {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    L0, T, B2 = 64, 256, 96
    ids2 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B2, L0)), jnp.int32)
    emb2 = embed_text(qparams["mamba"], ids2, jnp.bfloat16)
    mmu_best = jax.jit(
        lambda p, i, e: generate(
            p, cfg, input_ids=i, input_embeddings=e, task="mmu",
            max_length=L0 + T, sample=SampleParams(top_k=1),
            cache_dtype=jnp.bfloat16,
        ).sequences
    )

    def measure(tag: str) -> float:
        out = mmu_best(qparams["mamba"], ids2, emb2)
        sync(out)
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            out = mmu_best(qparams["mamba"], ids2, emb2)
            sync(out)
            best = max(best, B2 * T / (time.time() - t0))
        print(f"[{tag}] B=96 int8+bf16state: {best:.0f} tok/s", flush=True)
        return best

    clean = measure("A clean")

    # Phase B: bring the CFG T2I program into HBM (compile + one run),
    # exactly like the r4 bench's t2i_cfg section, then re-measure.
    n_cfg = 48
    cond = rng.integers(0, cfg.vocab_size, (n_cfg, 72))
    ids_cfg = jnp.asarray(
        np.concatenate([cond, np.tile(cond[:1], (n_cfg, 1))]), jnp.int32
    )
    gen_cfg = jax.jit(
        lambda p, i: t2i_generate(
            p, model, i, cfg_scale=7.5,
            sample=SampleParams(top_k=2, temperature=1.0),
            key=jax.random.PRNGKey(0), decode_image=True,
        )[0]
    )
    t0 = time.time()
    imgs = gen_cfg(qparams, ids_cfg)
    sync(imgs)
    print(f"CFG compile+run: {time.time()-t0:.0f}s", flush=True)
    del imgs

    after = measure("B post-CFG")
    print(
        f"RESULT clean={clean:.0f} post_cfg={after:.0f} "
        f"ratio={after/max(clean,1e-9):.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
