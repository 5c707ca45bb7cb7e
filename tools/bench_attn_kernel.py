"""Isolate where `ops/pallas_attn.cross_attn_layer` loses bandwidth.

tools/bench_dma.py shows auto-pipelined DMA+sum reaches ~900 GB/s, so the
~440 GB/s seen by the flash cross-attention kernel is NOT a DMA ceiling.
Suspects: per-tile compute latency serializing with DMA (flash softmax,
two small matmuls), the (B, NT) grid order, K and V alternating on one
pipeline, or the scalar-prefetch layer indexing.

Run on the real TPU: python tools/bench_attn_kernel.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_diarize_tpu.ops import pallas_attn as pa

L, B, H, DH, TT = 4, 16, 20, 64, 512
NT = 3
Q = 1


def timed(fn, *ops, reps_lo=64, reps_hi=320):
    """fn(s: f32 scalar, *ops) -> f32 scalar; s is loop-carried to defeat
    hoisting. `ops` are real jit arguments so the remote compiler never sees
    them as embedded constants."""

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(reps, *ops):
        def step(acc, _):
            return fn(acc * 1e-30, *ops).reshape(()) * 1e-6 + acc * 1e-6, None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return acc

    out = {}
    for reps in (reps_lo, reps_hi):
        np.asarray(run(reps, *ops))
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(reps, *ops))
            best = min(best, time.perf_counter() - t0)
        out[reps] = best
    return (out[reps_hi] - out[reps_lo]) / (reps_hi - reps_lo)


def main() -> None:
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    k5 = jnp.asarray(rng.standard_normal((L, B, NT, H, DH, TT)), jnp.bfloat16)
    v5 = jnp.asarray(rng.standard_normal((L, B, NT, H, DH, TT)), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((B, Q, H, DH)), jnp.bfloat16)
    layer = jnp.int32(1)
    per_layer_bytes = 2 * B * NT * H * DH * TT * 2
    print(f"per-call stream: {per_layer_bytes/1e6:.1f} MB")

    # 1. the real kernel
    def real(s, q0, k5, v5):
        q = q0 + s.astype(jnp.bfloat16)
        o = pa.cross_attn_layer(layer, q, k5, v5, ta_total=1500)
        return jnp.sum(o, dtype=jnp.float32)

    t = timed(real, q0, k5, v5)
    print(f"cross_attn_layer        {t*1e3:7.3f} ms  {per_layer_bytes/t/1e9:6.1f} GB/s")

    # 2. same kernel, no scalar prefetch: layer pre-sliced on host (4D k/v)
    k4, v4 = k5[1], v5[1]

    def presliced(s, q0, k4, v4):
        q = q0 + s.astype(jnp.bfloat16)
        o = _attn_4d(q, k4, v4)
        return jnp.sum(o, dtype=jnp.float32)

    t = timed(presliced, q0, k4, v4)
    print(f"presliced (no l-idx)    {t*1e3:7.3f} ms  {per_layer_bytes/t/1e9:6.1f} GB/s")

    # 3. DMA-only kernel over the same 6D layout with scalar prefetch
    def dma_only(s, k5, v5):
        return _sum_6d(layer, k5, v5, s)

    t = timed(dma_only, k5, v5)
    print(f"dma+sum 6D prefetch     {t*1e3:7.3f} ms  {per_layer_bytes/t/1e9:6.1f} GB/s")

    # 4. flash compute but fed a CONSTANT tile (no HBM traffic for K/V):
    #    isolates per-tile compute+softmax latency
    def compute_only(s, q0, k1, v1):
        q = q0 + s.astype(jnp.bfloat16)
        o = _attn_4d(q, k1, v1)  # 1 tile per stream
        return jnp.sum(o, dtype=jnp.float32)

    t = timed(compute_only, q0, k4[:, :1].copy(), v4[:, :1].copy())
    print(f"1-tile compute          {t*1e3:7.3f} ms  (latency floor per grid row)")

    # 5. 6D layout + attention compute, layer baked as a CONSTANT (no
    #    scalar prefetch): isolates prefetch vs 6D-layout cost
    def const_l(s, q0, k5, v5):
        q = q0 + s.astype(jnp.bfloat16)
        o = _attn_6d_const(q, k5, v5)
        return jnp.sum(o, dtype=jnp.float32)

    t = timed(const_l, q0, k5, v5)
    print(f"6D const-layer attn     {t*1e3:7.3f} ms  {per_layer_bytes/t/1e9:6.1f} GB/s")

    # 6. real kernel but grid flattened to (B*NT,) with prefetch
    def flat(s, q0, k5, v5):
        q = q0 + s.astype(jnp.bfloat16)
        o = _attn_6d_flat(layer, q, k5, v5)
        return jnp.sum(o, dtype=jnp.float32)

    t = timed(flat, q0, k5, v5)
    print(f"6D prefetch flat-grid   {t*1e3:7.3f} ms  {per_layer_bytes/t/1e9:6.1f} GB/s")


def _attn_kernel_4d(ta_total, scale, t_tile,
                    q_ref, k_ref, v_ref, o_ref, m_ref, l2_ref, acc_ref):
    pa._flash_kernel.__wrapped__ if False else None
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l2_ref[:] = jnp.zeros_like(l2_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    qh = jnp.transpose(q.astype(jnp.float32), (1, 0, 2)) * scale
    s = jax.lax.dot_general(
        qh.astype(k.dtype), k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
    s = jnp.where((t * t_tile + col) < ta_total, s, -jnp.inf)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :, None])
    l2_ref[:] = l2_ref[:] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv
    m_ref[:] = m_new

    @pl.when(t == n_t - 1)
    def _():
        out = acc_ref[:] / l2_ref[:][:, :, None]
        o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


@jax.jit
def _attn_4d(q, k4, v4):
    B_, Q_, H_, Dh = q.shape
    _, NT_, _, _, TT_ = k4.shape
    grid = (B_, NT_)
    return pl.pallas_call(
        functools.partial(_attn_kernel_4d, 1500, float(Dh) ** -0.5, TT_),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_, H_, Dh), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, H_, Dh, TT_), lambda b, t: (b, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, H_, Dh, TT_), lambda b, t: (b, t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Q_, H_, Dh), lambda b, t: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, Q_, H_, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_, Dh), jnp.float32),
        ],
    )(q, k4, v4)


def _sum_6d_kernel(l_ref, k_ref, v_ref, s_ref, o_ref, acc_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        acc_ref[0, 0] = 0.0

    acc_ref[0, 0] += (
        jnp.sum(jnp.maximum(k_ref[...].astype(jnp.float32), s_ref[0, 0]))
        + jnp.sum(v_ref[...].astype(jnp.float32))
    )

    @pl.when((b == pl.num_programs(0) - 1) & (t == pl.num_programs(1) - 1))
    def _():
        o_ref[0, 0] = acc_ref[0, 0]


@jax.jit
def _sum_6d(layer, k5, v5, s):
    return pl.pallas_call(
        _sum_6d_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, NT),
            in_specs=[
                pl.BlockSpec((1, 1, 1, H, DH, TT),
                             lambda b, t, l: (l[0], b, t, 0, 0, 0)),
                pl.BlockSpec((1, 1, 1, H, DH, TT),
                             lambda b, t, l: (l[0], b, t, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(layer.reshape(1), k5, v5, s.reshape(1, 1))


@jax.jit
def _attn_6d_const(q, k5, v5):
    B_, Q_, H_, Dh = q.shape
    L_, _, NT_, _, _, TT_ = k5.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel_6d_const, 1500, float(Dh) ** -0.5, TT_),
        grid=(B_, NT_),
        in_specs=[
            pl.BlockSpec((1, Q_, H_, Dh), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, H_, Dh, TT_), lambda b, t: (1, b, t, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, H_, Dh, TT_), lambda b, t: (1, b, t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Q_, H_, Dh), lambda b, t: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B_, Q_, H_, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_, Dh), jnp.float32),
        ],
    )(q, k5, v5)


def _attn_kernel_6d_const(ta_total, scale, t_tile,
                          q_ref, k_ref, v_ref, o_ref, m_ref, l2_ref, acc_ref):
    _attn_kernel_4d(ta_total, scale, t_tile, q_ref,
                    k_ref.at[0], v_ref.at[0], o_ref, m_ref, l2_ref, acc_ref)


def _flash_flat(ta_total, scale, t_tile, n_t,
                l_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l2_ref, acc_ref):
    i = pl.program_id(0)
    t = jax.lax.rem(i, n_t)

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l2_ref[:] = jnp.zeros_like(l2_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    qh = jnp.transpose(q.astype(jnp.float32), (1, 0, 2)) * scale
    s = jax.lax.dot_general(
        qh.astype(k.dtype), k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
    s = jnp.where((t * t_tile + col) < ta_total, s, -jnp.inf)
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :, None])
    l2_ref[:] = l2_ref[:] * alpha + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv
    m_ref[:] = m_new

    @pl.when(t == n_t - 1)
    def _():
        out = acc_ref[:] / l2_ref[:][:, :, None]
        o_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(o_ref.dtype)


@jax.jit
def _attn_6d_flat(layer, q, k5, v5):
    B_, Q_, H_, Dh = q.shape
    L_, _, NT_, _, _, TT_ = k5.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_ * NT_,),
        in_specs=[
            pl.BlockSpec((1, Q_, H_, Dh), lambda i, l: (i // NT_, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, H_, Dh, TT_),
                         lambda i, l: (l[0], i // NT_, i % NT_, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, H_, Dh, TT_),
                         lambda i, l: (l[0], i // NT_, i % NT_, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Q_, H_, Dh), lambda i, l: (i // NT_, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_), jnp.float32),
            pltpu.VMEM((H_, Q_, Dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_flash_flat, 1500, float(Dh) ** -0.5, TT_, NT_),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_, Q_, H_, Dh), q.dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), q, k5, v5)


if __name__ == "__main__":
    main()
