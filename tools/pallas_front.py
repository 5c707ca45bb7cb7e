"""Fused decoder-layer FRONT kernel (ln1 + q/k/v projections +
self-attention for greedy sampling steps) — QUARANTINED (VERDICT r3 #7).

The companion of the decoder-tail megakernel (`ops/pallas_tail.py`): the
per-stream K/V cache blocks ride the BlockSpec pipeline (layer index
scalar-prefetched, one contiguous [H, Tc, Dh] block per stream); the three
projection matrices stream through the same 3-slot manual-DMA tile
pipeline as the tail. The cache is read PRE-update — this step's fresh K/V
row is returned (feature-major) for the caller's cheap XLA
dynamic_update_slice, and self-attention covers it via an extra "self
column" appended to the cache scores.

TPU acceptance verdict (tools/bench_megakernel.py, large-v3 b16, v5e, two
sessions): greedy tail+front 9.935 / 9.95 ms/step vs tail-only 9.723 /
9.83 — the FRONT kernel LOSES (XLA's S=1 self-attention step is already
tight) and is not attached by any product path. It lives here, outside the
package, with its interpret-mode parity test
(`tests/test_pallas_tail.py::test_fused_front_matches_xla`) so the design
is preserved should a future geometry (longer caches, bigger batch) make
the front stream DMA-bound again.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_diarize_tpu.ops.pallas_tail import (
    _COMPILER_PARAMS,
    N_SLOTS,
    _ln_t,
    _onehot_cols,
    _pick_tw,
)


def pack_front_weights(params, cfg):
    """{"w": [L, 3*D//TW, D, TW] q/k/v column tiles, "b": [L, 4, D]
    (ln1_s, ln1_b, q_b, v_b)} for `fused_front_layer`."""
    blk = params["decoder"]["blocks"]
    D = cfg.n_text_state
    TW = _pick_tw(D)
    L = blk["q_w"].shape[0]

    def col_tiles(w):
        return jnp.transpose(
            w.reshape(L, D, D // TW, TW), (0, 2, 1, 3))

    w = jnp.concatenate(
        [col_tiles(blk["q_w"]), col_tiles(blk["k_w"]),
         col_tiles(blk["v_w"])], axis=1)
    b = jnp.stack(
        [blk["ln1_s"], blk["ln1_b"], blk["q_b"], blk["v_b"]], axis=1)
    return {"w": w, "b": b}


def _front_kernel(D, TW, n_d, H, Dh, Tc, scale,
                  l_ref, pos_ref, rp_ref, xT_ref, sm_ref, w_hbm,
                  kc_ref, vc_ref, so_ref, knT_ref, vnT_ref,
                  qT, wbuf, sems):
    b = pl.program_id(0)
    l = l_ref[0]
    pos = pos_ref[0]
    dtype = xT_ref.dtype

    @pl.when(b == 0)
    def _proj():
        sm = sm_ref[0]  # [4, D]
        h1 = _ln_t(xT_ref[...], sm[0], sm[1], dtype)

        def dma(i):
            return pltpu.make_async_copy(
                w_hbm.at[l, i], wbuf.at[i % N_SLOTS], sems.at[i % N_SLOTS])

        n = 3 * n_d
        for i in range(min(N_SLOTS - 1, n)):
            dma(i).start()
        for i in range(n):
            if i + N_SLOTS - 1 < n:
                dma(i + N_SLOTS - 1).start()
            dma(i).wait()
            y = jax.lax.dot_general(
                wbuf[i % N_SLOTS], h1, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [TW, N]
            kind, j = divmod(i, n_d)
            cols = slice(j * TW, (j + 1) * TW)
            if kind == 0:
                qT[cols, :] = (
                    y + sm[2, cols].astype(jnp.float32)[:, None]
                ).astype(dtype)
            elif kind == 1:
                knT_ref[cols, :] = y.astype(dtype)  # k has no bias
            else:
                vnT_ref[cols, :] = (
                    y + sm[3, cols].astype(jnp.float32)[:, None]
                ).astype(dtype)

    # ---- self-attention for stream b (the math of `_attn`, one query) ----
    k = kc_ref[0, 0]  # [H, Tc, Dh] pre-update cache
    v = vc_ref[0, 0]
    sel1 = _onehot_cols(qT.shape[1], 1, b, dtype)  # [B, 1]

    def col_b(ref):  # dynamic-lane gather of stream b's column (see
        return jax.lax.dot_general(  # _onehot_cols) -> [H, Dh, 1] f32
            ref[...], sel1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(H, Dh, 1)

    q1 = col_b(qT)
    kn1 = col_b(knT_ref)
    vn1 = col_b(vnT_ref)
    qs = (q1 * scale).astype(k.dtype)

    s = jax.lax.dot_general(
        qs, (k.astype(jnp.float32) * scale).astype(k.dtype),
        (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, 1, Tc]
    kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
    valid = (kpos < pos) & (kpos >= rp_ref[b])
    s = jnp.where(valid, s, -jnp.inf)
    s_self = jax.lax.dot_general(
        qs, (kn1.astype(jnp.float32) * scale).astype(k.dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, 1, 1]

    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_self)
    p = jnp.exp(s - m)
    p_self = jnp.exp(s_self - m)
    l2 = jnp.sum(p, axis=-1, keepdims=True) + p_self
    w = (p / l2).astype(v.dtype)  # [H, 1, Tc]
    w_self = (p_self / l2).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, 1, Dh]
    out = out + w_self.astype(jnp.float32) * jnp.transpose(
        vn1.astype(jnp.float32), (0, 2, 1))
    so_ref[0] = out.astype(so_ref.dtype)  # [H, 1, Dh]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_front_layer(
    layer_idx,          # scalar int32
    pos_offset,         # scalar int32 — buffer slot being written
    row_pad,            # [B] int32 per-row prompt left-pad
    x: jnp.ndarray,     # [B, 1, D] layer input
    front_w: jnp.ndarray,   # [L, 3*D//TW, D, TW] pack_front_weights()["w"]
    front_b: jnp.ndarray,   # [L, 4, D]
    kc: jnp.ndarray,    # [L, B, H, Tc, Dh] self cache (pre-update)
    vc: jnp.ndarray,
    interpret: bool | None = None,
):
    """ln1 + qkv + self-attention -> (self_out [B, H, 1, Dh],
    k_new [B, H, 1, Dh], v_new [B, H, 1, Dh])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, _, D = x.shape
    L, _, H, Tc, Dh = kc.shape
    TW = front_w.shape[3]
    n_d = D // TW
    scale = float(Dh) ** -0.25  # `_attn` scales q and k each by Dh^-1/4

    xT = x[:, 0].T
    l_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    p_arr = jnp.asarray(pos_offset, jnp.int32).reshape(1)
    rp = jnp.asarray(row_pad, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((D, B), lambda b, l, p, rp: (0, 0)),
            pl.BlockSpec((1, 4, D), lambda b, l, p, rp: (l[0], 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, H, Tc, Dh),
                         lambda b, l, p, rp: (l[0], b, 0, 0, 0)),
            pl.BlockSpec((1, 1, H, Tc, Dh),
                         lambda b, l, p, rp: (l[0], b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, 1, Dh), lambda b, l, p, rp: (b, 0, 0, 0)),
            pl.BlockSpec((D, B), lambda b, l, p, rp: (0, 0)),
            pl.BlockSpec((D, B), lambda b, l, p, rp: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, B), x.dtype),             # qT
            pltpu.VMEM((N_SLOTS, D, TW), front_w.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )
    so, knT, vnT = pl.pallas_call(
        functools.partial(_front_kernel, D, TW, n_d, H, Dh, Tc, scale),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, 1, Dh), x.dtype),
            jax.ShapeDtypeStruct((D, B), x.dtype),
            jax.ShapeDtypeStruct((D, B), x.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(l_arr, p_arr, rp, xT, front_b, front_w, kc, vc)
    k_new = knT.T.reshape(B, H, Dh)[:, :, None, :]
    v_new = vnT.T.reshape(B, H, Dh)[:, :, None, :]
    return so, k_new, v_new
