"""Fused embed+max-pool Pallas kernel for the late-fusion policy.

The PPO update's minibatch cost is NOT flops (the embed GEMMs are ~0.4 ms
per 8192-sample minibatch) and NOT assembly (probe_epoch_v3) — it is the
HBM round-trips of the materialized [B, E, 64] per-entity activations:
every Dense/LayerNorm/tanh stage of the partner (E=127) and road (E=200)
embeds writes + reads ~130-210 MB per minibatch, ~5 of the measured
~7 ms/minibatch.  XLA cannot fuse across the two GEMMs, so the fix is a
Pallas kernel that streams entity chunks through VMEM:

  fwd:  read x [B, E, F] once (42 MB for road), keep every [chunk, 64]
        intermediate in VMEM, write ONLY the pooled [B, 64] row + the
        winning entity index [B, 64] int32.
  bwd:  re-read x, recompute the chunk activations (flash-attention
        style), scatter the pooled cotangent to the winner rows, and
        accumulate parameter gradients across the grid (TPU grids run
        sequentially per core, so += into the same output block is safe).

Semantics vs the flax module (reference: gpudrive/networks/late_fusion.py
:117-144 — Linear->LayerNorm->act->Linear then max over entities):
  * dots run on the MXU in the module's compute dtype with f32
    accumulation; LayerNorm statistics are f32 (slightly MORE precise
    than flax's bf16 path).
  * max-pool backward is winner-takes-all via the fwd argmax.  jnp.max
    splits the cotangent evenly among exact ties; ties across entities
    are measure-zero for real embeddings, and the PPO equivalence test
    (tests/test_fused_embed.py) covers the end-to-end contract.
  * d/dx is NOT computed (the obs minibatch is data — nothing upstream
    of it carries parameters).  The custom_vjp returns zeros for x;
    never use this op where the input requires gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6  # flax.linen.LayerNorm default

# One B-tile of the grid; entity chunks sized so each [TB*EC, 64] f32
# intermediate stays small.  Mosaic's scoped-vmem stack scales with the
# UNROLLED chunk count (it does not reuse stack across the Python-level
# chunk loop): on a real v5e the fwd kernel at TB=128 was 164 KB over the
# 16 MB limit and the bwd at TB=64 was 1.43 MB over ([4096, 127, 6]
# partner shape); TB=32 AOT-compiles both kernels at both production
# shapes with headroom.
_TB = 32
_EC = 16


def _chunks(E):
    """Static (start, size) entity chunks covering E (remainder-aware)."""
    out = []
    e0 = 0
    while e0 < E:
        out.append((e0, min(_EC, E - e0)))
        e0 += _EC
    return out


def _act(x, act):
    return jnp.tanh(x) if act == "tanh" else jax.nn.gelu(x)


def _embed_chunk(xs, w1, b1, g, be, w2, b2, act, cd):
    """[R, F] -> (y [R, H] f32, residuals) — the Linear/LN/act/Linear
    stack with f32 accumulation and f32 LN statistics."""
    pre = jnp.dot(xs.astype(cd), w1.astype(cd),
                  preferred_element_type=jnp.float32) + b1
    mu = jnp.mean(pre, axis=-1, keepdims=True)
    var = jnp.mean((pre - mu) * (pre - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xh = (pre - mu) * rstd
    t = _act(xh * g + be, act)
    y = jnp.dot(t.astype(cd), w2.astype(cd),
                preferred_element_type=jnp.float32) + b2
    return y, (xh, rstd, t)


def _fwd_kernel(x_ref, w1_ref, b1_ref, g_ref, be_ref, w2_ref, b2_ref,
                out_ref, amax_ref, *, E, F, H, act, cd):
    w1 = w1_ref[:]
    b1 = b1_ref[:]
    g = g_ref[:]
    be = be_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    acc = jnp.full((_TB, H), -jnp.inf, jnp.float32)
    am = jnp.zeros((_TB, H), jnp.int32)
    # cast the whole block once: slicing+reshaping a bf16 ref directly hits
    # Mosaic "infer-vector-layout: unsupported shape cast" (bf16 obs store)
    xb = x_ref[...].astype(jnp.float32)
    for e0, ec in _chunks(E):
        xs = xb[:, e0:e0 + ec, :].reshape(_TB * ec, F)
        y, _ = _embed_chunk(xs, w1, b1, g, be, w2, b2, act, cd)
        y3 = y.reshape(_TB, ec, H)
        cmax = jnp.max(y3, axis=1)
        eidx = jax.lax.broadcasted_iota(jnp.int32, (_TB, ec, H), 1) + e0
        carg = jnp.max(
            jnp.where(y3 == cmax[:, None, :], eidx, -1), axis=1
        )
        am = jnp.where(cmax > acc, carg, am)
        acc = jnp.maximum(acc, cmax)
    out_ref[:] = acc
    amax_ref[:] = am


def _bwd_kernel(x_ref, w1_ref, b1_ref, g_ref, be_ref, w2_ref, b2_ref,
                am_ref, dp_ref,
                dw1_ref, db1_ref, dg_ref, dbe_ref, dw2_ref, db2_ref,
                *, E, F, H, act, cd):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    w1 = w1_ref[:]
    b1 = b1_ref[:]
    g = g_ref[:]
    be = be_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    am = am_ref[:]
    dp = dp_ref[:].astype(jnp.float32)
    xb = x_ref[...].astype(jnp.float32)  # see _fwd_kernel: bf16 layout cast
    for e0, ec in _chunks(E):
        xs = xb[:, e0:e0 + ec, :].reshape(_TB * ec, F)
        y, (xh, rstd, t) = _embed_chunk(xs, w1, b1, g, be, w2, b2, act, cd)
        eidx = jax.lax.broadcasted_iota(jnp.int32, (_TB, ec, H), 1) + e0
        dY = jnp.where(eidx == am[:, None, :], dp[:, None, :], 0.0)
        dY2 = dY.reshape(_TB * ec, H)
        db2_ref[:] += jnp.sum(dY2, axis=0, keepdims=True)
        dw2_ref[:] += jax.lax.dot_general(
            t.astype(cd), dY2.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dt = jax.lax.dot_general(
            dY2.astype(cd), w2.astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if act == "tanh":
            dlin = dt * (1.0 - t * t)
        else:  # gelu'
            lin = xh * g + be
            c = jnp.float32(0.7978845608028654)
            a = jnp.float32(0.044715)
            u = c * (lin + a * lin * lin * lin)
            th = jnp.tanh(u)
            dlin = dt * (0.5 * (1.0 + th)
                         + 0.5 * lin * (1.0 - th * th)
                         * c * (1.0 + 3.0 * a * lin * lin))
        dg_ref[:] += jnp.sum(dlin * xh, axis=0, keepdims=True)
        dbe_ref[:] += jnp.sum(dlin, axis=0, keepdims=True)
        dxh = dlin * g
        dpre = (dxh
                - jnp.mean(dxh, axis=-1, keepdims=True)
                - xh * jnp.mean(dxh * xh, axis=-1, keepdims=True)) * rstd
        db1_ref[:] += jnp.sum(dpre, axis=0, keepdims=True)
        dw1_ref[:] += jax.lax.dot_general(
            xs.astype(cd), dpre.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pad_rows(x, tb):
    B = x.shape[0]
    pad = (-B) % tb
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return x, B


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_embed_pool(x, w1, b1, g, be, w2, b2, meta):
    """max_e Embed(x)[.., e, :] without materializing [B, E, H] to HBM.

    x: [B, E, F]; params as flax stores them (w1 [F, H], b1 [H], LN scale/
    bias [H], w2 [H, H], b2 [H]); meta = (act, compute_dtype_name).
    Returns pooled [B, H] float32.  d/dx is defined as ZERO (see module
    docstring).
    """
    out, _ = _fused_fwd_impl(x, w1, b1, g, be, w2, b2, meta)
    return out


def _fused_fwd_impl(x, w1, b1, g, be, w2, b2, meta):
    act, cd_name = meta
    cd = jnp.dtype(cd_name)
    B0, E, F = x.shape
    H = w1.shape[1]
    x, B = _pad_rows(x, _TB)
    grid = (x.shape[0] // _TB,)
    row2 = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_fwd_kernel, E=E, F=F, H=H, act=act, cd=cd)
    out, amax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, E, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for s in ((F, H), (1, H), (1, H), (1, H), (H, H), (1, H))],
        out_specs=[
            pl.BlockSpec((_TB, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], H), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], H), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x, w1.astype(jnp.float32), row2(b1), row2(g), row2(be),
      w2.astype(jnp.float32), row2(b2))
    return out[:B], amax[:B]


def _fused_fwd(x, w1, b1, g, be, w2, b2, meta):
    out, amax = _fused_fwd_impl(x, w1, b1, g, be, w2, b2, meta)
    return out, (x, w1, b1, g, be, w2, b2, amax)


def _fused_bwd(meta, res, dpool):
    x, w1, b1, g, be, w2, b2, amax = res
    act, cd_name = meta
    cd = jnp.dtype(cd_name)
    B0, E, F = x.shape
    H = w1.shape[1]
    xp, B = _pad_rows(x, _TB)
    # padding rows: amax=-1 never matches an entity index -> zero grad
    amp = _pad_rows(amax, _TB)[0].at[B:].set(-1) if xp.shape[0] != B else amax
    dpp, _ = _pad_rows(dpool.astype(jnp.float32), _TB)
    grid = (xp.shape[0] // _TB,)
    row2 = lambda v: v.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, E=E, F=F, H=H, act=act, cd=cd)
    const = lambda s: pl.BlockSpec(s, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    dw1, db1, dg, dbe, dw2, db2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, E, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((F, H)), const((1, H)), const((1, H)), const((1, H)),
            const((H, H)), const((1, H)),
            pl.BlockSpec((_TB, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[const((F, H)), const((1, H)), const((1, H)),
                   const((1, H)), const((H, H)), const((1, H))],
        out_shape=[
            jax.ShapeDtypeStruct((F, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, w1.astype(jnp.float32), row2(b1), row2(g), row2(be),
      w2.astype(jnp.float32), row2(b2), amp, dpp)
    shape1 = lambda v, p: v.reshape(p.shape).astype(p.dtype)
    return (jnp.zeros_like(x), shape1(dw1, w1), shape1(db1, b1),
            shape1(dg, g), shape1(dbe, be), shape1(dw2, w2),
            shape1(db2, b2))


fused_embed_pool.defvjp(_fused_fwd, _fused_bwd)


def reference_embed_pool(x, w1, b1, g, be, w2, b2, act="tanh"):
    """Pure-jnp oracle with the kernel's exact numeric recipe (f32 accum,
    f32 LN stats) for unit tests."""
    y, _ = _embed_chunk(
        x.reshape(-1, x.shape[-1]), w1, b1.reshape(1, -1), g.reshape(1, -1),
        be.reshape(1, -1), w2, b2.reshape(1, -1), act, jnp.float32,
    )
    return jnp.max(y.reshape(x.shape[:-1] + (w1.shape[1],)), axis=-2)
