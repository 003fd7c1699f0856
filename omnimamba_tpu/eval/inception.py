"""InceptionV3 pool3 feature extractor for standard FID (JAX/XLA).

MS-COCO FID numbers (the reference reports 5.5, README.md:29-31 teaser) are
only comparable when computed on InceptionV3 pool3 features. This module
implements the torchvision ``inception_v3`` trunk (through the final
adaptive average pool, 2048-d) in JAX, plus a converter from a torchvision
state_dict — so ``eval/t2i_fid.py`` produces standard FID the moment
`inception_v3` weights are available locally (zero-egress here: weights
cannot be fetched, and the shipped default therefore falls back to
VQ-encoder features, which are a RELATIVE metric only).

Implementation notes — two pooling variants, selected by ``variant``:
- BasicConv2d = Conv(bias=False) -> BatchNorm(eps=1e-3) -> ReLU; at
  inference BN folds to scale/shift from running stats.
- ``variant="fid"`` reproduces pytorch-fid's graph (the published-number
  protocol): in-block avg pools use count_include_pad=False
  (FIDInceptionA/C/E_1), and Mixed_7c — FIDInceptionE_2 in pytorch-fid —
  uses a 3x3 stride-1 MAX pool in its pool branch (a deliberate
  reproduction of the original TF-FID port's quirk). Use this with the
  TF-ported ``pt_inception-2015-12-05`` weights (fc has 1008 classes).
- ``variant="torchvision"`` reproduces torchvision eval semantics: avg
  pools everywhere with count_include_pad=True. FID computed with
  torchvision weights under this variant is self-consistent but only
  APPROXIMATELY comparable to published pytorch-fid numbers (different
  weights and Mixed_7c pooling); treat cross-paper deltas <~1 FID as noise.
- Input contract: uint8 HWC images; resized to 299x299 bilinear
  (antialias=False, matching torch's F.interpolate default used by
  pytorch-fid) and scaled to [-1, 1].

Weight layout: a flat dict of numpy arrays keyed by torchvision names
("Conv2d_1a_3x3.conv.weight", "Mixed_5b.branch1x1.bn.running_mean", ...),
as produced by ``torch.load(...)['state_dict']`` or
``convert_torch_inception`` below.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _fold_bn(w, bn_gamma, bn_beta, bn_mean, bn_var, eps=1e-3):
    """Fold inference BatchNorm into conv scale/shift (per out-channel)."""
    scale = bn_gamma / np.sqrt(bn_var + eps)
    shift = bn_beta - bn_mean * scale
    return w * scale[:, None, None, None], shift


def convert_torch_inception(state: Dict[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state_dict -> folded-BN pytree.

    Each BasicConv2d becomes {"w": (kh, kw, cin, cout) HWIO, "b": (cout,)}.
    """
    out: Dict = {}
    names = sorted({k.rsplit(".", 2)[0] for k in state if k.endswith("conv.weight")})
    for base in names:
        w = np.asarray(state[f"{base}.conv.weight"], np.float32)  # OIHW
        g = np.asarray(state[f"{base}.bn.weight"], np.float32)
        b = np.asarray(state[f"{base}.bn.bias"], np.float32)
        m = np.asarray(state[f"{base}.bn.running_mean"], np.float32)
        v = np.asarray(state[f"{base}.bn.running_var"], np.float32)
        wf, sh = _fold_bn(w, g, b, m, v)
        out[base] = {
            "w": jnp.asarray(np.transpose(wf, (2, 3, 1, 0))),  # HWIO
            "b": jnp.asarray(sh),
        }
    return out


def _conv(p, x, stride=1, padding=0):
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + p["b"])


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def _avgpool3(x, count_include_pad=False):
    """3x3 stride-1 pad-1 average pool. count_include_pad=False is
    pytorch-fid's FIDInception choice; True is torchvision's default."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )
    return s / n


def _maxpool3_same(x):
    """3x3 stride-1 pad-1 max pool (pytorch-fid FIDInceptionE_2's pool
    branch — the TF-FID port quirk in Mixed_7c)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
    )


def _inception_a(p, x, prefix, incl_pad=False):
    b1 = _conv(p[f"{prefix}.branch1x1"], x)
    b5 = _conv(p[f"{prefix}.branch5x5_1"], x)
    b5 = _conv(p[f"{prefix}.branch5x5_2"], b5, padding=2)
    b3 = _conv(p[f"{prefix}.branch3x3dbl_1"], x)
    b3 = _conv(p[f"{prefix}.branch3x3dbl_2"], b3, padding=1)
    b3 = _conv(p[f"{prefix}.branch3x3dbl_3"], b3, padding=1)
    bp = _conv(p[f"{prefix}.branch_pool"], _avgpool3(x, incl_pad))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x, prefix):
    b3 = _conv(p[f"{prefix}.branch3x3"], x, stride=2)
    bd = _conv(p[f"{prefix}.branch3x3dbl_1"], x)
    bd = _conv(p[f"{prefix}.branch3x3dbl_2"], bd, padding=1)
    bd = _conv(p[f"{prefix}.branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x, prefix, incl_pad=False):
    b1 = _conv(p[f"{prefix}.branch1x1"], x)
    b7 = _conv(p[f"{prefix}.branch7x7_1"], x)
    b7 = _conv(p[f"{prefix}.branch7x7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv(p[f"{prefix}.branch7x7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _conv(p[f"{prefix}.branch7x7dbl_1"], x)
    bd = _conv(p[f"{prefix}.branch7x7dbl_2"], bd, padding=((3, 3), (0, 0)))
    bd = _conv(p[f"{prefix}.branch7x7dbl_3"], bd, padding=((0, 0), (3, 3)))
    bd = _conv(p[f"{prefix}.branch7x7dbl_4"], bd, padding=((3, 3), (0, 0)))
    bd = _conv(p[f"{prefix}.branch7x7dbl_5"], bd, padding=((0, 0), (3, 3)))
    bp = _conv(p[f"{prefix}.branch_pool"], _avgpool3(x, incl_pad))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x, prefix):
    b3 = _conv(p[f"{prefix}.branch3x3_1"], x)
    b3 = _conv(p[f"{prefix}.branch3x3_2"], b3, stride=2)
    b7 = _conv(p[f"{prefix}.branch7x7x3_1"], x)
    b7 = _conv(p[f"{prefix}.branch7x7x3_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _conv(p[f"{prefix}.branch7x7x3_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _conv(p[f"{prefix}.branch7x7x3_4"], b7, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x, prefix, pool="avg", incl_pad=False):
    b1 = _conv(p[f"{prefix}.branch1x1"], x)
    b3 = _conv(p[f"{prefix}.branch3x3_1"], x)
    b3 = jnp.concatenate(
        [
            _conv(p[f"{prefix}.branch3x3_2a"], b3, padding=((0, 0), (1, 1))),
            _conv(p[f"{prefix}.branch3x3_2b"], b3, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    bd = _conv(p[f"{prefix}.branch3x3dbl_1"], x)
    bd = _conv(p[f"{prefix}.branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate(
        [
            _conv(p[f"{prefix}.branch3x3dbl_3a"], bd, padding=((0, 0), (1, 1))),
            _conv(p[f"{prefix}.branch3x3dbl_3b"], bd, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    pooled = _maxpool3_same(x) if pool == "max" else _avgpool3(x, incl_pad)
    bp = _conv(p[f"{prefix}.branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@functools.partial(jax.jit, static_argnames=("variant",))
def inception_pool3(params: Dict, images: jax.Array, variant: str = "fid") -> jax.Array:
    """images: (B, 299, 299, 3) float32 in [-1, 1] -> (B, 2048) features.

    variant="fid": pytorch-fid graph (count_include_pad=False avg pools,
    Mixed_7c pool branch is a 3x3 max pool) — the published-number protocol,
    meant for the TF-ported pt_inception-2015-12-05 weights.
    variant="torchvision": plain torchvision eval graph (avg everywhere,
    count_include_pad=True) — only approximately FID-comparable.
    """
    if variant not in ("fid", "torchvision"):
        raise ValueError(f"unknown inception variant: {variant!r}")
    incl_pad = variant == "torchvision"
    x = images
    x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _conv(params["Conv2d_2a_3x3"], x)
    x = _conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool(x)
    x = _conv(params["Conv2d_3b_1x1"], x)
    x = _conv(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params, x, m, incl_pad)
    x = _inception_b(params, x, "Mixed_6a")
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params, x, m, incl_pad)
    x = _inception_d(params, x, "Mixed_7a")
    x = _inception_e(params, x, "Mixed_7b", pool="avg", incl_pad=incl_pad)
    pool_7c = "avg" if variant == "torchvision" else "max"
    x = _inception_e(params, x, "Mixed_7c", pool=pool_7c, incl_pad=incl_pad)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def preprocess_uint8(imgs_uint8: np.ndarray) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, 299, 299, 3) float32 in [-1, 1], bilinear
    resize (pytorch-fid contract)."""
    x = jnp.asarray(imgs_uint8, jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0], 299, 299, 3), method="bilinear", antialias=False
    )
    return x * 2.0 - 1.0


def save_inception_npz(
    pth_path: str, out_path: str, variant: str | None = None
) -> str:
    """Convert a torch InceptionV3 state_dict (.pth) to the framework's
    flat npz, embedding the ``__variant__`` marker that
    ``inception_features`` requires (auto-detected from the fc head when
    not given: 1008 classes = pytorch-fid's TF-ported weights -> "fid",
    1000 = torchvision). Returns the detected/used variant."""
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    npstate = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
    if variant is None:
        fc = npstate.get("fc.weight")
        variant = "fid" if fc is not None and fc.shape[0] == 1008 else "torchvision"
    params = convert_torch_inception(npstate)
    flat = {
        f"{base}/{leaf}": np.asarray(v)
        for base, leaves in params.items()
        for leaf, v in leaves.items()
    }
    flat["__variant__"] = np.asarray(variant)
    np.savez(out_path, **flat)
    return variant


def inception_features(
    weights_path: str, variant: str | None = None
) -> Callable[[np.ndarray], np.ndarray]:
    """Feature extractor for compute_fid(): loads a converted ``.npz`` (see
    scripts/convert_ckpt.py --kind inception) or a torch ``.pth`` state_dict.

    ``variant=None`` auto-detects: pytorch-fid's TF-ported weights carry a
    1008-class fc (``pt_inception-2015-12-05``) -> "fid" graph; a
    1000-class fc (torchvision) -> "torchvision" graph, which is only
    approximately comparable to published FID numbers (see module doc).
    """
    if weights_path.endswith(".npz"):
        flat = dict(np.load(weights_path))
        if variant is None:
            v = flat.pop("__variant__", None)
            if v is None:
                # Refuse to guess (ADVICE r3): a torchvision-derived npz
                # silently getting the max-pool "fid" graph corrupts every
                # downstream FID with no warning. npz files written by
                # save_inception_npz / convert_ckpt.py --kind inception
                # always carry the marker.
                raise ValueError(
                    f"{weights_path} has no __variant__ key; re-export it "
                    "with scripts/convert_ckpt.py --kind inception (which "
                    "embeds the marker) or pass variant='fid'/'torchvision' "
                    "explicitly"
                )
            variant = str(np.asarray(v).item())
        else:
            flat.pop("__variant__", None)
        params: Dict = {}
        for k, v in flat.items():
            base, leaf = k.rsplit("/", 1)
            params.setdefault(base, {})[leaf] = jnp.asarray(v)
    else:
        import torch

        state = torch.load(weights_path, map_location="cpu", weights_only=True)
        if "state_dict" in state:
            state = state["state_dict"]
        npstate = {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
        if variant is None:
            fc = npstate.get("fc.weight")
            variant = "fid" if fc is not None and fc.shape[0] == 1008 else "torchvision"
        params = convert_torch_inception(npstate)
    if variant == "torchvision":
        import warnings

        warnings.warn(
            "InceptionV3 running with torchvision weights/graph: FID values "
            "are only approximately comparable to published pytorch-fid "
            "numbers (use pt_inception-2015-12-05 weights for exact protocol)."
        )

    def fn(imgs_uint8: np.ndarray) -> np.ndarray:
        return np.asarray(
            inception_pool3(params, preprocess_uint8(imgs_uint8), variant=variant)
        )

    return fn


# expected BasicConv2d output channels, for structure tests / random init
_CHANNELS = {
    "Conv2d_1a_3x3": (3, 32, 3, 2, 0), "Conv2d_2a_3x3": (32, 32, 3, 1, 0),
    "Conv2d_2b_3x3": (32, 64, 3, 1, 1), "Conv2d_3b_1x1": (64, 80, 1, 1, 0),
    "Conv2d_4a_3x3": (80, 192, 3, 1, 0),
}


def random_params(key: jax.Array) -> Dict:
    """Randomly-initialized full parameter set (for structure tests and
    smoke benchmarks; NOT valid for comparable FID numbers)."""

    def conv(key, cin, cout, kh, kw):
        return {
            "w": 0.05 * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    specs: Dict[str, tuple] = {}
    for name, (cin, cout, k, _, _) in _CHANNELS.items():
        specs[name] = (cin, cout, k, k)

    def a_block(prefix, cin, pool):
        specs[f"{prefix}.branch1x1"] = (cin, 64, 1, 1)
        specs[f"{prefix}.branch5x5_1"] = (cin, 48, 1, 1)
        specs[f"{prefix}.branch5x5_2"] = (48, 64, 5, 5)
        specs[f"{prefix}.branch3x3dbl_1"] = (cin, 64, 1, 1)
        specs[f"{prefix}.branch3x3dbl_2"] = (64, 96, 3, 3)
        specs[f"{prefix}.branch3x3dbl_3"] = (96, 96, 3, 3)
        specs[f"{prefix}.branch_pool"] = (cin, pool, 1, 1)

    a_block("Mixed_5b", 192, 32)
    a_block("Mixed_5c", 256, 64)
    a_block("Mixed_5d", 288, 64)
    specs["Mixed_6a.branch3x3"] = (288, 384, 3, 3)
    specs["Mixed_6a.branch3x3dbl_1"] = (288, 64, 1, 1)
    specs["Mixed_6a.branch3x3dbl_2"] = (64, 96, 3, 3)
    specs["Mixed_6a.branch3x3dbl_3"] = (96, 96, 3, 3)

    def c_block(prefix, c7):
        specs[f"{prefix}.branch1x1"] = (768, 192, 1, 1)
        specs[f"{prefix}.branch7x7_1"] = (768, c7, 1, 1)
        specs[f"{prefix}.branch7x7_2"] = (c7, c7, 1, 7)
        specs[f"{prefix}.branch7x7_3"] = (c7, 192, 7, 1)
        specs[f"{prefix}.branch7x7dbl_1"] = (768, c7, 1, 1)
        specs[f"{prefix}.branch7x7dbl_2"] = (c7, c7, 7, 1)
        specs[f"{prefix}.branch7x7dbl_3"] = (c7, c7, 1, 7)
        specs[f"{prefix}.branch7x7dbl_4"] = (c7, c7, 7, 1)
        specs[f"{prefix}.branch7x7dbl_5"] = (c7, 192, 1, 7)
        specs[f"{prefix}.branch_pool"] = (768, 192, 1, 1)

    c_block("Mixed_6b", 128)
    c_block("Mixed_6c", 160)
    c_block("Mixed_6d", 160)
    c_block("Mixed_6e", 192)
    specs["Mixed_7a.branch3x3_1"] = (768, 192, 1, 1)
    specs["Mixed_7a.branch3x3_2"] = (192, 320, 3, 3)
    specs["Mixed_7a.branch7x7x3_1"] = (768, 192, 1, 1)
    specs["Mixed_7a.branch7x7x3_2"] = (192, 192, 1, 7)
    specs["Mixed_7a.branch7x7x3_3"] = (192, 192, 7, 1)
    specs["Mixed_7a.branch7x7x3_4"] = (192, 192, 3, 3)

    def e_block(prefix, cin):
        specs[f"{prefix}.branch1x1"] = (cin, 320, 1, 1)
        specs[f"{prefix}.branch3x3_1"] = (cin, 384, 1, 1)
        specs[f"{prefix}.branch3x3_2a"] = (384, 384, 1, 3)
        specs[f"{prefix}.branch3x3_2b"] = (384, 384, 3, 1)
        specs[f"{prefix}.branch3x3dbl_1"] = (cin, 448, 1, 1)
        specs[f"{prefix}.branch3x3dbl_2"] = (448, 384, 3, 3)
        specs[f"{prefix}.branch3x3dbl_3a"] = (384, 384, 1, 3)
        specs[f"{prefix}.branch3x3dbl_3b"] = (384, 384, 3, 1)
        specs[f"{prefix}.branch_pool"] = (cin, 192, 1, 1)

    e_block("Mixed_7b", 1280)
    e_block("Mixed_7c", 2048)

    params = {}
    for i, (name, (cin, cout, kh, kw)) in enumerate(specs.items()):
        params[name] = conv(jax.random.fold_in(key, i), cin, cout, kh, kw)
    return params
