"""Deterministic geometry fuzz for the Pallas SSD kernels (interpret mode).

The per-shape tests pin a handful of geometries; the bugs this round found
(a head_tile spanning B/C groups, sub-tile boundary decay) lived exactly in
the cross-product of geometry knobs no pinned test covered. This sweep
draws seeded random (B, L, H, P, G, N, Q, head_tile) combinations — always
valid per the kernels' contracts — and checks forward outputs AND gradients
against the chunked-XLA autodiff oracle.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnimamba_tpu.ops.ssd_chunked import ssd_chunked
from omnimamba_tpu.ops.ssd_pallas import ssd_pallas
from omnimamba_tpu.ops.ssd_pallas_bwd import ssd_pallas_ad
from omnimamba_tpu.ops.ssd_reference import ssd_scan_reference
from tests.test_ssd import _random_ssd_inputs


def _draw_geometry(rng):
    G = int(rng.choice([1, 2]))
    rep = int(rng.choice([1, 2, 4]))
    H = G * rep
    P = int(rng.choice([4, 8]))
    N = int(rng.choice([8, 16]))
    B = int(rng.choice([1, 2]))
    Q = int(rng.choice([8, 16, 48, 256, 384]))
    # keep interpret-mode runtime bounded while still exercising padding,
    # multi-chunk scans and (for Q>=256) the 128-wide sub-tile path
    L = int(rng.choice([Q // 2 + 1, Q, Q + 5, 2 * Q]))
    divisors = [d for d in (1, 2, 4) if rep % d == 0]
    ht = int(rng.choice(divisors))
    return dict(B=B, L=max(L, 1), H=H, P=P, G=G, N=N), Q, ht


@pytest.mark.parametrize("seed", range(6))
def test_pallas_fuzz_geometry(seed):
    rng = np.random.default_rng(1000 + seed)
    args, Q, ht = _draw_geometry(rng)
    x, dt, A, Bm, Cm, D = _random_ssd_inputs(jax.random.PRNGKey(seed), **args)

    # forward vs sequential oracle
    y_ref, s_ref = ssd_scan_reference(x, dt, A, Bm, Cm, D)
    y_pal, s_pal = ssd_pallas(x, dt, A, Bm, Cm, D, chunk_size=Q, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_ref), rtol=3e-3, atol=3e-3,
        err_msg=f"fwd y {args} Q={Q}",
    )
    np.testing.assert_allclose(
        np.asarray(s_pal), np.asarray(s_ref), rtol=3e-3, atol=3e-3,
        err_msg=f"fwd state {args} Q={Q}",
    )

    # grads vs chunked-XLA autodiff
    k1, k2 = jax.random.split(jax.random.PRNGKey(100 + seed))
    wy = jax.random.normal(k1, x.shape)
    ws = jax.random.normal(k2, (args["B"], args["H"], args["P"], args["N"]))

    def grads(fn):
        def loss(x, dt, A, Bm, Cm, D):
            y, s = fn(x, dt, A, Bm, Cm, D)
            return jnp.sum(y.astype(jnp.float32) * wy) + jnp.sum(s * ws)

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, Bm, Cm, D)

    ref = grads(functools.partial(ssd_chunked, chunk_size=Q))
    got = grads(
        functools.partial(
            ssd_pallas_ad, chunk_size=Q, head_tile=ht, interpret=True
        )
    )
    for n, r, g in zip(["dx", "ddt", "dA", "dB", "dC", "dD"], ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=4e-3, atol=4e-3,
            err_msg=f"{n} {args} Q={Q} ht={ht}",
        )
