"""Chunked Mamba-2 SSD in pure XLA — the training/prefill workhorse.

State-space duality: within a chunk of size Q the recurrence is evaluated as
a masked (attention-like) matmul block that maps straight onto the MXU; across
chunks a tiny ``lax.scan`` passes the (H, P, N) state. This is the TPU-native
counterpart of mamba_ssm's Triton ``ssd_combined`` pipeline
(chunk_state -> state_passing -> chunk_scan; SURVEY §2.3 row 1) — re-derived
from the recurrence, not ported.

Numerics: all exponentials/cumsums in fp32; matmuls accumulate in fp32
(``preferred_element_type``); carried state fp32. Differentiable end-to-end —
the default training path relies on XLA autodiff of this function, and the
whole thing is fused/remat-friendly.

The reference uses chunk_size=256 (mamba_ssm default); so do we.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _segment_cumsum(a: jax.Array) -> jax.Array:
    """Inclusive cumsum along the chunk (Q) axis. a: (B, C, Q, H) fp32."""
    return jnp.cumsum(a, axis=2)


@partial(jax.jit, static_argnames=("chunk_size",))
def ssd_chunked(
    x: jax.Array,  # (B, L, H, P)
    dt: jax.Array,  # (B, L, H) softplus'ed (includes dt_bias)
    A: jax.Array,  # (H,) negative
    Bmat: jax.Array,  # (B, L, G, N)
    Cmat: jax.Array,  # (B, L, G, N)
    D: Optional[jax.Array] = None,  # (H,)
    *,
    initial_state: Optional[jax.Array] = None,  # (B, H, P, N) fp32
    chunk_size: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (y (B,L,H,P) in x.dtype, final_state (B,H,P,N) fp32).

    Matches ``ssd_reference.ssd_scan_reference`` to fp32 accuracy.
    """
    Bsz, L, H, P = x.shape
    G, N = Bmat.shape[2], Bmat.shape[3]
    Q = chunk_size
    pad = (-L) % Q
    Lp = L + pad
    C = Lp // Q

    if pad:
        # dt=0 at padded positions => decay 1 and zero contribution:
        # the carried state passes through unchanged.
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bmat = jnp.pad(Bmat, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cmat = jnp.pad(Cmat, ((0, 0), (0, pad), (0, 0), (0, 0)))

    xc = x.reshape(Bsz, C, Q, H, P)
    dtc = dt.reshape(Bsz, C, Q, H).astype(jnp.float32)
    Bc = Bmat.reshape(Bsz, C, Q, G, N)
    Cc = Cmat.reshape(Bsz, C, Q, G, N)

    a = dtc * A.astype(jnp.float32)[None, None, None, :]  # (B,C,Q,H) <= 0
    s = _segment_cumsum(a)  # inclusive
    total = s[:, :, -1, :]  # (B,C,H)

    # --- intra-chunk (quadratic/"attention" form on the MXU) ---------------
    # scores[b,c,g,i,j] = C_i . B_j
    scores = jnp.einsum(
        "bcign,bcjgn->bcgij", Cc, Bc, preferred_element_type=jnp.float32
    )
    # decay[b,c,h,i,j] = exp(s_i - s_j) for j<=i else 0
    si = s[:, :, :, None, :]  # (B,C,Q,1,H) -> i index at axis 2
    sj = s[:, :, None, :, :]  # (B,C,1,Q,H) -> j index at axis 3
    diff = jnp.moveaxis(si - sj, -1, 2)  # (B,C,H,Q,Q)
    mask = jnp.tril(jnp.ones((Q, Q), dtype=bool))
    # Mask BEFORE the exp: above the diagonal diff = s_i - s_j >= 0 grows
    # with the masked-out span (hundreds at Q=256), so exp overflows to inf
    # there. The forward's where() hides that, but the autodiff backward
    # forms d(exp)=exp(diff)*cotangent = inf*0 = NaN at masked positions
    # (observed on TPU at L=329: NaN ddt/dA through this line). Clamping
    # the masked lanes to 0 keeps exp bounded (diff <= 0 under the mask).
    diff = jnp.where(mask[None, None, None], diff, 0.0)
    decay = jnp.where(mask[None, None, None], jnp.exp(diff), 0.0)
    rep = H // G
    scores_h = jnp.repeat(scores, rep, axis=2)  # (B,C,H,Q,Q)
    attn = scores_h * decay  # fp32
    dtx = dtc[..., None] * xc.astype(jnp.float32)  # (B,C,Q,H,P)
    y_intra = jnp.einsum(
        "bchij,bcjhp->bcihp", attn, dtx, preferred_element_type=jnp.float32
    )

    # --- chunk states ------------------------------------------------------
    # S[b,c,h,p,n] = sum_j exp(total - s_j) dt_j x_j B_j
    state_decay = jnp.exp(total[:, :, None, :] - s)  # (B,C,Q,H)
    Bh = jnp.repeat(Bc, rep, axis=3)  # (B,C,Q,H,N)
    chunk_states = jnp.einsum(
        "bcqhp,bcqhn->bchpn",
        dtx * state_decay[..., None],
        Bh.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    # --- inter-chunk state passing (sequential over C chunks) -------------
    if initial_state is None:
        h0 = jnp.zeros((Bsz, H, P, N), dtype=jnp.float32)
    else:
        h0 = initial_state.astype(jnp.float32)

    def pass_state(h, inp):
        tot_c, S_c = inp  # (B,H), (B,H,P,N)
        h_next = h * jnp.exp(tot_c)[..., None, None] + S_c
        return h_next, h  # emit state *entering* the chunk

    final_state, h_prev = jax.lax.scan(
        pass_state,
        h0,
        (jnp.moveaxis(total, 1, 0), jnp.moveaxis(chunk_states, 1, 0)),
    )
    h_prev = jnp.moveaxis(h_prev, 0, 1)  # (B,C,H,P,N) state entering chunk c

    # --- inter-chunk output ------------------------------------------------
    Ch = jnp.repeat(Cc, rep, axis=3)  # (B,C,Q,H,N)
    y_inter = jnp.einsum(
        "bcqhn,bchpn->bcqhp",
        Ch.astype(jnp.float32),
        h_prev,
        preferred_element_type=jnp.float32,
    ) * jnp.exp(s)[..., None]

    y = y_intra + y_inter
    if D is not None:
        y = y + xc.astype(jnp.float32) * D.astype(jnp.float32)[None, None, None, :, None]
    y = y.reshape(Bsz, Lp, H, P)[:, :L]
    return y.astype(x.dtype), final_state
