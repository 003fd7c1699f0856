"""InceptionV3 pool3 extractor: structure, converter, and FID plumbing."""

import numpy as np
import jax
import jax.numpy as jnp

from omnimamba_tpu.eval.inception import (
    convert_torch_inception,
    inception_pool3,
    preprocess_uint8,
    random_params,
)


def test_pool3_shape_and_finite():
    params = random_params(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 48, 3), np.uint8)
    x = preprocess_uint8(imgs)
    assert x.shape == (2, 299, 299, 3)
    assert float(x.max()) <= 1.0 and float(x.min()) >= -1.0
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_variants_differ_only_in_pooling():
    """'fid' (pytorch-fid graph: count_include_pad=False avgs + Mixed_7c max
    pool) vs 'torchvision' (incl-pad avgs everywhere) must both run and give
    different features on the same weights; an unknown variant must raise."""
    params = random_params(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(1).integers(0, 255, (1, 64, 64, 3), np.uint8)
    x = preprocess_uint8(imgs)
    f_fid = np.asarray(inception_pool3(params, x, variant="fid"))
    f_tv = np.asarray(inception_pool3(params, x, variant="torchvision"))
    assert f_fid.shape == f_tv.shape == (1, 2048)
    assert np.isfinite(f_fid).all() and np.isfinite(f_tv).all()
    assert np.abs(f_fid - f_tv).max() > 0  # pooling choice must matter
    import pytest

    with pytest.raises(ValueError):
        inception_pool3(params, x, variant="bogus")


def test_feature_loader_detects_fid_weights(tmp_path):
    """inception_features auto-detects pytorch-fid weights by the 1008-class
    fc and selects the 'fid' graph; torchvision-shaped fc warns + selects
    'torchvision'."""
    import warnings

    import torch

    from omnimamba_tpu.eval.inception import inception_features

    # minimal single-conv state dict + fc marker (graph will fail on a full
    # forward, so only check variant selection via the emitted warning)
    rng = np.random.default_rng(0)

    def make_state(fc_rows):
        state = {}
        for base, (cin, cout, k) in {"Conv2d_1a_3x3": (3, 32, 3)}.items():
            state[f"{base}.conv.weight"] = torch.tensor(
                rng.standard_normal((cout, cin, k, k)).astype(np.float32))
            state[f"{base}.bn.weight"] = torch.ones(cout)
            state[f"{base}.bn.bias"] = torch.zeros(cout)
            state[f"{base}.bn.running_mean"] = torch.zeros(cout)
            state[f"{base}.bn.running_var"] = torch.ones(cout)
        state["fc.weight"] = torch.zeros((fc_rows, 2048))
        return state

    p_fid = tmp_path / "fid.pth"
    torch.save(make_state(1008), p_fid)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no approx-comparability warning
        inception_features(str(p_fid))

    p_tv = tmp_path / "tv.pth"
    torch.save(make_state(1000), p_tv)
    import pytest

    with pytest.warns(UserWarning, match="approximately comparable"):
        inception_features(str(p_tv))


def test_converter_folds_bn():
    """convert_torch_inception: OIHW->HWIO + BN fold, checked numerically
    against an explicit conv+BN on a single BasicConv2d."""
    rng = np.random.default_rng(1)
    cin, cout, k = 3, 4, 3
    state = {
        "Conv2d_1a_3x3.conv.weight": rng.standard_normal((cout, cin, k, k)).astype(np.float32),
        "Conv2d_1a_3x3.bn.weight": rng.uniform(0.5, 1.5, cout).astype(np.float32),
        "Conv2d_1a_3x3.bn.bias": rng.standard_normal(cout).astype(np.float32),
        "Conv2d_1a_3x3.bn.running_mean": rng.standard_normal(cout).astype(np.float32),
        "Conv2d_1a_3x3.bn.running_var": rng.uniform(0.5, 2.0, cout).astype(np.float32),
    }
    p = convert_torch_inception(state)["Conv2d_1a_3x3"]
    x = jnp.asarray(rng.standard_normal((1, 8, 8, cin)), jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    # explicit reference: conv (no bias) then inference BN
    w_oihw = state["Conv2d_1a_3x3.conv.weight"]
    yref = jax.lax.conv_general_dilated(
        x, jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0))), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    g, b = state["Conv2d_1a_3x3.bn.weight"], state["Conv2d_1a_3x3.bn.bias"]
    m, v = state["Conv2d_1a_3x3.bn.running_mean"], state["Conv2d_1a_3x3.bn.running_var"]
    yref = (yref - m) / np.sqrt(v + 1e-3) * g + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), rtol=1e-4, atol=1e-4)


def test_default_features_warns_and_falls_back(caplog):
    from omnimamba_tpu.config import VQConfig
    from omnimamba_tpu.eval.t2i_fid import default_features
    from omnimamba_tpu.models.vq import init_vq

    cfg = VQConfig(ch=8, encoder_ch_mult=(1, 2), decoder_ch_mult=(1, 2),
                   num_res_blocks=1, z_channels=4,
                   codebook_size=16, codebook_embed_dim=4)
    params = init_vq(jax.random.PRNGKey(0), cfg)
    import logging

    with caplog.at_level(logging.WARNING, logger="omnimamba"):
        fn = default_features(params, cfg)
    assert any("NOT" in r.message for r in caplog.records)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 32, 32, 3), np.uint8)
    assert fn(imgs).shape[0] == 2


def test_npz_requires_variant_marker(tmp_path):
    """ADVICE r3: a marker-less npz silently got the 'fid' graph. Now it
    errors; save_inception_npz embeds the marker and round-trips."""
    import pytest
    import torch

    from omnimamba_tpu.eval.inception import inception_features, save_inception_npz

    rng = np.random.default_rng(0)
    bare = tmp_path / "bare.npz"
    np.savez(bare, **{"Conv2d_1a_3x3/w": rng.standard_normal((3, 3, 3, 32))})
    with pytest.raises(ValueError, match="__variant__"):
        inception_features(str(bare))

    # explicit variant still accepted for legacy files
    inception_features(str(bare), variant="torchvision")

    # save_inception_npz: .pth -> npz with marker, auto-detected torchvision
    state = {}
    cout = 8
    state["Conv2d_1a_3x3.conv.weight"] = torch.tensor(
        rng.standard_normal((cout, 3, 3, 3)).astype(np.float32))
    state["Conv2d_1a_3x3.bn.weight"] = torch.ones(cout)
    state["Conv2d_1a_3x3.bn.bias"] = torch.zeros(cout)
    state["Conv2d_1a_3x3.bn.running_mean"] = torch.zeros(cout)
    state["Conv2d_1a_3x3.bn.running_var"] = torch.ones(cout)
    state["fc.weight"] = torch.zeros((1000, 2048))
    pth = tmp_path / "tv.pth"
    torch.save(state, pth)
    out = tmp_path / "tv.npz"
    assert save_inception_npz(str(pth), str(out)) == "torchvision"
    flat = dict(np.load(out))
    assert str(np.asarray(flat["__variant__"]).item()) == "torchvision"
    with pytest.warns(UserWarning, match="torchvision"):
        inception_features(str(out))
