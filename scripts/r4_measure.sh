#!/bin/bash
# Round-4 TPU measurement queue — run top-to-bottom when the tunnel is back.
# Each step logs to /tmp/r4_<name>.log. Stop on demand; steps are independent.
cd /root/repo
run() { name=$1; shift; echo "=== $name: $* ==="; timeout 2400 "$@" > /tmp/r4_$name.log 2>&1; echo "rc=$? ($name)"; }

# 0. compiled-kernel numerics smoke on hardware (interpret mode skips tiling
#    checks — CLAUDE.md r1 lesson): pallas_ad grads vs chunked-XLA autodiff
run smoke python -c "
import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad
rng = np.random.default_rng(0)
B,L,H,P,G,N = 2,512,8,64,1,128
x  = jnp.asarray(rng.standard_normal((B,L,H,P)), jnp.float32)
dt = jnp.asarray(rng.uniform(0.01,0.6,(B,L,H)), jnp.float32)
A  = -jnp.asarray(rng.uniform(0.5,1.5,(H,)), jnp.float32)
Bm = jnp.asarray(rng.standard_normal((B,L,G,N))/np.sqrt(N), jnp.float32)
Cm = jnp.asarray(rng.standard_normal((B,L,G,N))/np.sqrt(N), jnp.float32)
D  = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
def loss(f, q):
    return lambda *a: jnp.sum(jnp.square(f(*a, chunk_size=q)[0]))
for q in (256, 384):
    g1 = jax.jit(jax.grad(loss(lambda *a, **k: ssd_pallas_ad(*a, interpret=False, **k), q), argnums=(0,1,2,3,4,5)))(x,dt,A,Bm,Cm,D)
    g2 = jax.jit(jax.grad(loss(ssd_chunked, q), argnums=(0,1,2,3,4,5)))(x,dt,A,Bm,Cm,D)
    for a,b,n in zip(g1,g2,'x dt A B C D'.split()):
        err = float(jnp.max(jnp.abs(a-b))/(jnp.max(jnp.abs(b))+1e-9))
        print(q, n, f'{err:.2e}')
        assert err < 2e-3, (q, n, err)
print('TPU kernel smoke OK (Q=256, Q=384)')
"
# 1. bwd kernel micro-bench (baseline r3: ht=64 bwd-only ~1.20-1.25 ms at B=8 L=1280)
run ssd python scripts/profile_train.py ssd --batch 8 --seqlen 1280
# 2. t2i-only train step (baseline r3: 343 ms / 33.5% MFU; target <= ~300)
run step python scripts/profile_train.py step --batch 8
# 3. stage-2 mixed step (baseline r2: 515 ms full/full; target <= ~460)
run mixed python scripts/profile_train.py step --mmu
# 4. d_state lever: decode throughput at d_state=64 vs 128 (int8, B=96)
run dstate128 python scripts/profile_train.py decode --batch 96 --tokens 256 --int8
run dstate64 python scripts/profile_train.py decode --batch 96 --tokens 256 --int8 --d-state 64
# 4a. scaled-int8 SSM state at the serving sweet spot (baseline r3:
#     int8 weights + bf16 state B=96 = 3569 tok/s at the DMA ceiling;
#     int8 state halves that traffic — the first lever UNDER the ceiling)
run state_int8 python scripts/profile_train.py decode --batch 96 --tokens 256 --int8 --state-int8
run state_int8_b48 python scripts/profile_train.py decode --batch 48 --tokens 256 --int8 --state-int8
# 4a2. CFG T2I with int8 state (the priced structural lever: r3 CFG sat at
#      94% of the bf16-state DMA ceiling; int8 state moves the ceiling)
run cfg_int8state python -c "
import sys, time; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_compilation_cache_dir', '/tmp/omnimamba_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from omnimamba_tpu.config import MambaConfig, VisionConfig, VQConfig
from omnimamba_tpu.models.backbone import init_backbone
from omnimamba_tpu.models.omnimamba import OmniMambaModel, t2i_generate
from omnimamba_tpu.models.vq import init_vq
from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
from omnimamba_tpu.ops.sampling import SampleParams
cfg = MambaConfig(); vq_cfg = VQConfig()
model = OmniMambaModel(cfg=cfg, vision_cfg=VisionConfig(), vq_cfg=vq_cfg, sptids={})
params = {'mamba': init_backbone(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
          'vq': init_vq(jax.random.PRNGKey(1), vq_cfg, dtype=jnp.bfloat16)}
qp = fuse_in_proj(quantize_decode_params(params))
rng = np.random.default_rng(0)
def sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[-1])
for n_cfg in (48, 64):
    cond = rng.integers(0, cfg.vocab_size, (n_cfg, 72))
    ids = jnp.asarray(np.concatenate([cond, np.tile(cond[:1], (n_cfg, 1))]), jnp.int32)
    gen = jax.jit(lambda p, i: t2i_generate(p, model, i, cfg_scale=7.5,
        sample=SampleParams(top_k=2, temperature=1.0), key=jax.random.PRNGKey(0),
        decode_image=True, cache_dtype='int8')[0])
    imgs = gen(qp, ids); sync(imgs)
    t0 = time.time(); imgs = gen(qp, ids); sync(imgs)
    print(f'CFG int8-state: {n_cfg} imgs in {time.time()-t0:.2f}s = {n_cfg/(time.time()-t0):.2f} img/s', flush=True)
"
# 4b. LoRA-merge decode A/B at B=1 (merge removes 5 tiny matmuls/layer/step)
run b1_plain python scripts/profile_train.py decode --batch 1 --tokens 256 --int8
run b1_merged python scripts/profile_train.py decode --batch 1 --tokens 256 --int8 --merge-lora
# 5. distilled draft acceptance/latency at B=1
run distill python scripts/distill_draft.py --layers 4 --steps 300
# 6. full bench (also warms the persistent cache for the driver's run)
run bench python bench.py
# 7. POPE-scale soak (9k rows, ~21 min at 7.2 rows/s)
run soak python scripts/eval_mmu.py --protocol pope --synthetic 9000 --questions-per-image 6
# 8. Pallas norm A/B (opt-in kernel vs XLA baseline at the train step)
run step_pnorm env OMNIMAMBA_PALLAS_NORM=1 python scripts/profile_train.py step --batch 8
echo "ALL DONE"
