"""Sequence parallelism for the SSM — long-context prefill across chips.

SURVEY §5.7: the linear SSM's natural sequence parallelism is *state
passing* — each shard scans its slice locally, then the (tiny) final SSM
states flow across shards; no ring attention, no all-to-all. Three phases:

1. local chunked scan with zero initial state (``ops/ssd_chunked``);
2. all-gather of the per-shard (total-decay, final-state) summaries —
   (B, H) + (B, H, P, N) per shard, ~2 MB for the 1.3B — and a replicated
   exclusive prefix over shards giving each shard its incoming state;
3. local correction: y_t += e^{cumsum a_t} * (C_t . h_in).

``ssd_sp_local`` is the inside-shard_map building block; ``backbone`` -level
sequence parallelism (whole-model long prefill, incl. the causal conv's
cross-shard halo via ppermute) lives in ``models/backbone.py:
backbone_forward_sp``. The reference has no analog (max context 1500); this
is what makes 100K+-token prefill a multi-chip operation with only
O(params)-sized comms.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_correction(
    y_loc: jax.Array,  # (B, Lloc, H, P)
    dt: jax.Array,  # (B, Lloc, H) fp32
    A: jax.Array,  # (H,)
    Cmat: jax.Array,  # (B, Lloc, G, N)
    h_in: jax.Array,  # (B, H, P, N) fp32 incoming state
) -> jax.Array:
    B, L, H, P = y_loc.shape
    G = Cmat.shape[2]
    rep = H // G
    a = dt.astype(jnp.float32) * A.astype(jnp.float32)[None, None, :]
    cums = jnp.cumsum(a, axis=1)  # inclusive (B, L, H)
    Ch = jnp.repeat(Cmat.astype(jnp.float32), rep, axis=2)  # (B, L, H, N)
    corr = jnp.einsum(
        "blhn,bhpn->blhp", Ch, h_in, preferred_element_type=jnp.float32
    ) * jnp.exp(cums)[..., None]
    return (y_loc.astype(jnp.float32) + corr).astype(y_loc.dtype)


def ssd_sp_local(
    xs: jax.Array,  # (B, Lloc, H, P) this shard's slice
    dts: jax.Array,  # (B, Lloc, H)
    A: jax.Array,  # (H,)
    Bs: jax.Array,  # (B, Lloc, G, N)
    Cs: jax.Array,  # (B, Lloc, G, N)
    D: Optional[jax.Array],
    *,
    axis: str,
    n_sp: int,
    chunk_size: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """State-passing SSD for use INSIDE an existing shard_map over ``axis``.

    Returns (y_local, final_state_replicated)."""
    from omnimamba_tpu.ops.ssd_chunked import ssd_chunked

    y_loc, state_loc = ssd_chunked(xs, dts, A, Bs, Cs, D, chunk_size=chunk_size)
    a_tot = jnp.sum(
        dts.astype(jnp.float32) * A.astype(jnp.float32)[None, None, :], axis=1
    )
    decay_tot = jnp.exp(a_tot)  # (B, H)

    all_states = jax.lax.all_gather(state_loc, axis)  # (n_sp, B, H, P, N)
    all_decay = jax.lax.all_gather(decay_tot, axis)  # (n_sp, B, H)
    idx = jax.lax.axis_index(axis)

    # replicated exclusive prefix over shards (n_sp is tiny)
    h = jnp.zeros_like(state_loc)
    prefixes = []
    for t in range(n_sp):
        prefixes.append(h)
        h = h * all_decay[t][..., None, None] + all_states[t]
    final_global = h
    h_in = jnp.stack(prefixes, 0)[idx]

    y = _local_correction(y_loc, dts, A, Cs, h_in)
    return y, final_global


def halo_left(x: jax.Array, width: int, axis: str, n_sp: int) -> jax.Array:
    """Left halo for a causal conv under sequence sharding: each shard
    receives the previous shard's last ``width`` positions (zeros on shard
    0). x: (B, Lloc, C) -> (B, width, C)."""
    tail = x[:, -width:, :]
    perm = [(i, i + 1) for i in range(n_sp - 1)]
    recv = jax.lax.ppermute(tail, axis, perm)  # shard i gets shard i-1's tail
    idx = jax.lax.axis_index(axis)
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def ssd_sequence_parallel(
    mesh: Mesh,
    x: jax.Array,  # (B, L, H, P) — L sharded over 'sp'
    dt: jax.Array,  # (B, L, H)
    A: jax.Array,  # (H,)
    Bmat: jax.Array,  # (B, L, G, N)
    Cmat: jax.Array,  # (B, L, G, N)
    D: Optional[jax.Array] = None,
    *,
    chunk_size: int = 256,
    axis: str = "sp",
) -> Tuple[jax.Array, jax.Array]:
    """Standalone entry: shard_map wrapper around ``ssd_sp_local``.
    Returns (y with L sharded as given, final fp32 state replicated)."""
    n_sp = mesh.shape[axis]

    def shard_fn(xs, dts, Bs, Cs):
        return ssd_sp_local(
            xs, dts, A, Bs, Cs, D, axis=axis, n_sp=n_sp, chunk_size=chunk_size
        )

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P()),
        check_vma=False,
    )
    return shard(x, dt, Bmat, Cmat)
