"""Sequence-parallel chunkwise mLSTM over a device mesh.

Implements the SURVEY §2.6 long-context design: shard S across a mesh
axis and thread the tiny (C, n) chunk-boundary states between shards —
the linear mLSTM recurrence needs no ring attention or all-to-all.

Mechanics (inside ``shard_map`` over the sequence axis):
1. each shard runs a cheap *state-only* pass over its local tokens,
   producing the affine map of the inter-chunk recurrence restricted to
   the shard: ``state_out = G * state_in + delta`` with
   ``G = exp(sum logsig(f))`` scalar per head and
   ``delta = (dC, dn)`` of size DHQK x DHHV (+DHQK) per head;
2. the per-shard maps are ``all_gather``-ed (they are tiny — KBs) and
   every shard composes the exclusive prefix locally, yielding its
   inbound state.  A ``ppermute`` ring would pipeline this in n hops;
   with states this small one all_gather + local compose is both
   simpler and fewer collective launches, so that is what ships;
3. each shard runs the full chunkwise kernel with
   ``c_initial/n_initial = inbound`` — outputs are exact, independent of
   the sharding (the recurrence is associative).

Exactness caveat: bit-for-bit shard-count independence holds for f32
inputs.  For bf16 inputs the chunkwise kernels use bf16 matmul operands
while this state pass accumulates dC/dN from f32-upcast operands, so the
inbound states differ from an unsharded run by bf16 rounding (~1e-3
relative) — the f32 state pass is kept deliberately: the boundary states
are the one quantity that compounds across shards.

Local S must divide the chunk size policy as usual; any registered
chunkwise kernel works for pass 3 (Pallas on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xlstm_yolo_tpu.ops import backend as ops_backend
from xlstm_yolo_tpu.ops.mlstm_chunkwise import chunkwise_log_gates, _split_chunks

f32 = jnp.float32

__all__ = ["sequence_parallel_chunkwise", "chunkwise_shard_states"]


def chunkwise_shard_states(k, v, i, f, chunk_size: int,
                           compute_dtype=jnp.bfloat16):
    """State-only pass: the shard's affine map (G, dC, dn).

    Runs only the O(S * DHQK * DHHV) state math — none of the intra-chunk
    (L, L) work (that happens once, in pass 3).

    ``compute_dtype`` is the matmul operand dtype of the pass-3 kernel so
    the sharded run matches an unsharded one: this pass mirrors the
    native chunkwise kernel's state math exactly (mlstm_chunkwise.py:
    115-128 — cd-operand kbar/dC matmul with f32 accumulation, f32 dN
    sum), which is the default pass-3 kernel. f32 inputs are
    bit-identical under every kernel; bf16 inputs are bit-identical
    under the native kernel and within one product-rounding of the
    Pallas v2 kernel (which multiplies kbar in f32 before the bf16
    cast, chunkwise_v2.py:152-156).
    """
    B, NH, S, DHQK = k.shape
    DHHV = v.shape[-1]
    L = min(chunk_size, S)
    assert S % L == 0
    cd = f32 if k.dtype == f32 else compute_dtype
    gates = chunkwise_log_gates(i, f, L)
    kc = _split_chunks(k, L)
    vc = _split_chunks(v, L)
    abar = jnp.exp(gates.vecA)  # (B, NH, NC, L)
    kbar = kc.astype(cd) * abar[..., None].astype(cd)
    dC = jnp.einsum("bhnld,bhnlv->bhndv", kbar, vc.astype(cd),
                    preferred_element_type=f32)
    dN = kbar.astype(f32).sum(axis=-2)
    gbar = jnp.exp(gates.scaG)  # (B, NH, NC)

    def step(carry, xs):
        G, C, n = carry
        g_k, dC_k, dN_k = xs
        return (G * g_k, g_k[..., None, None] * C + dC_k,
                g_k[..., None] * n + dN_k), None

    # carry inits derive from the (possibly shard_map-varying) inputs so
    # the scan carry types match under manual-axes tracking
    zeroC = dC[:, :, 0] * 0.0
    (G, C, n), _ = jax.lax.scan(
        step,
        (gbar[..., 0] * 0.0 + 1.0, zeroC, dN[:, :, 0] * 0.0),
        (jnp.moveaxis(gbar, -1, 0), jnp.moveaxis(dC, 2, 0),
         jnp.moveaxis(dN, 2, 0)),
    )
    return G, C, n


def sequence_parallel_chunkwise(
    mesh: Mesh,
    axis: str,
    q, k, v, i, f,
    chunk_size: int = 64,
    kernel_name: str = "chunkwise--native_autograd",
    eps: float = 1e-6,
):
    """Exact chunkwise mLSTM with S sharded over ``mesh[axis]``.

    Inputs: (B, NH, S, DH*) / (B, NH, S) global arrays (sharded or not —
    they are constrained to the sequence sharding).  Returns h with the
    same sequence sharding.
    """
    kern = ops_backend.get_mlstm_kernel(kernel_name)
    n_shards = mesh.shape[axis]
    S = q.shape[2]
    assert S % n_shards == 0, f"S={S} not divisible by {n_shards} shards"

    spec4 = P(None, None, axis, None)
    spec3 = P(None, None, axis)

    def local(q_l, k_l, v_l, i_l, f_l):
        # pass 1: shard state map
        G, C, n = chunkwise_shard_states(k_l, v_l, i_l, f_l, chunk_size)
        # pass 2: gather all shard maps, compose exclusive prefix
        Gs = jax.lax.all_gather(G, axis)        # (n, B, NH)
        Cs = jax.lax.all_gather(C, axis)        # (n, B, NH, DHQK, DHHV)
        ns = jax.lax.all_gather(n, axis)
        idx = jax.lax.axis_index(axis)

        def compose(carry, xs):
            C_in, n_in = carry
            G_s, C_s, n_s = xs
            return (G_s[..., None, None] * C_in + C_s,
                    G_s[..., None] * n_in + n_s), (C_in, n_in)

        (_, _), (C_pref, n_pref) = jax.lax.scan(
            compose,
            (C * 0.0, n * 0.0),
            (Gs, Cs, ns),
        )  # emits the state *before* each shard
        C_in = C_pref[idx]
        n_in = n_pref[idx]
        # pass 3: full local chunkwise with the inbound state
        h_l, _ = kern(
            q_l, k_l, v_l, i_l, f_l, chunk_size=min(chunk_size, q_l.shape[2]),
            c_initial=C_in, n_initial=n_in, return_last_states=True, eps=eps,
        )
        return h_l

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec3, spec3),
        out_specs=spec4,
    )
    cons = partial(jax.lax.with_sharding_constraint)
    q = cons(q, NamedSharding(mesh, spec4))
    k = cons(k, NamedSharding(mesh, spec4))
    v = cons(v, NamedSharding(mesh, spec4))
    i = cons(i, NamedSharding(mesh, spec3))
    f = cons(f, NamedSharding(mesh, spec3))
    return fn(q, k, v, i, f)
