"""Fused decoder-layer TAIL megakernel for sampling steps.

One pallas_call per decoder layer absorbs everything after self-attention
(`models/whisper.py::_decoder_layer_tail`, mirroring the per-layer tail of
whisper.cpp's decoder graph the reference drives via `state.full`,
`/root/reference/src/transcribe.rs:389`):

    x += unheads(self_out) @ o_w + o_b
    h  = ln2(x);  cq = heads(h @ cq_w + cq_b)
    x += unheads(flash_cross(cq, K5, V5)) @ co_w + co_b
    h  = ln3(x);  x += gelu(h @ fc1_w + fc1_b) @ fc2_w + fc2_b

Why fuse: a large-v3 b16 sampling step is pure HBM streaming (~176 MB per
layer: cross K/V ~123 MB + tail weights ~36 MB + self path ~17 MB) and the
XLA step time sits ~35% above the bytes/bandwidth floor — op-boundary gaps
where HBM idles, not compute. This kernel keeps the DMA queue busy across
the whole tail: the cross K/V blocks ride the same auto-pipelined BlockSpec
stream as `pallas_attn.py::cross_attn_layer` (layer index scalar-prefetched,
grid (B, NT)), while the five projection matrices stream through a 3-slot
round-robin manual-DMA pipeline (`make_async_copy`) as uniform [D, TW]
tiles from one pre-packed [L, NTOT, D, TW] bundle (`pack_tail_weights`).

Transposed-activation design: every intermediate is FEATURE-MAJOR
([D, rows] instead of [rows, D]). Two birds: (1) the MXU emits projection
outputs already transposed (weight tile as lhs, contraction on its input
axis — the trick `pallas_attn.py::_cross_build_kernel` uses), so tile
results land in place with no in-VMEM transpose; (2) the only reshapes are
major-dim splits/merges ([D, KQ] -> [H, Dh, KQ]), which Mosaic supports,
where row-major activations would need minor(lane)-dim splits, which it
does not. The XLA caller passes x/self_out transposed (a few hundred KB,
negligible next to the layer's streams).

Numerics mirror the XLA tail op-for-op (bf16 matmuls with f32 accumulation
cast back per op, f32 layernorm, f32 flash softmax identical to
`cross_attn_layer`); parity is pinned by `tests/test_pallas_tail.py`.

Single-device only: under a mesh the tail's projections contract the full
feature axis (TP would need collectives inside the kernel), so callers
fall back to the un-fused path (`models/whisper.py` gates on mesh is None).

TPU acceptance verdict (tools/bench_megakernel.py, large-v3 b16, v5e,
32/64-step slopes): greedy tail 9.895 -> 9.723 ms/step — KEPT as the
greedy default; greedy tail+front 9.935 — the FRONT kernel loses (the
XLA self-attention step is already tight at S=1) and is no longer
attached by TranscribeStep/bench.py; beam-5 with the ~2 GB weight pack
resident on top of the split beam cache exhausts v5e HBM
(RESOURCE_EXHAUSTED), so the pack is attached for greedy strategies only.
The losing FRONT kernel (ln1 + qkv + self-attention) is QUARANTINED to
`tools/pallas_front.py` (VERDICT r3 #7) with its parity test; only
`tools/bench_megakernel.py` attaches a front pack, so the product package
carries no dead kernel weight.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

N_SLOTS = 3  # manual-DMA pipeline depth for the weight-tile stream
SMALL_ROWS = 8  # ln2_s, ln2_b, ln3_s, ln3_b, o_b, cq_b, co_b, fc2_b

# Mosaic's default scoped-VMEM stack limit is 16 MiB; the tail kernel's
# scratch (3 weight slots + flash accumulators) plus double-buffered cross
# K/V blocks needs ~16.4 MiB at large-v3 geometry (measured on v5e: 382 KiB
# over). v5e has 128 MiB VMEM per core — raise the cap well clear of it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

_PROBE_OK: dict = {}


def megakernels_supported(D: int = 1280, H: int = 20,
                          wq: bool = False, kvq: bool = False) -> bool:
    """Per-geometry probe: compile + run the TAIL megakernel at THIS
    model's decoder geometry (tiny batch, L=1, TT=512; TW via `_pick_tw`),
    in the variant the caller will engage (`wq` int8 weight tiles, `kvq`
    int8 cross K/V).

    The kernel was developed against the interpret-mode backend, and
    Mosaic lowering can fail where interpret succeeds (unsupported
    relayouts, VMEM overflow, sub-128 tile slices on small test models —
    e.g. Dh=32 fixtures abort with a tiling-alignment error). Callers that
    engage the kernel BY DEFAULT (`TranscribeStep`, `bench.py`) gate on
    this WITH THE MODEL'S OWN D/H so a lowering failure degrades to the
    un-fused Pallas-cross path with a warning instead of killing the run
    (same pattern as `pallas_attn.cross_build_supported`); the benchmark
    tools bypass it to keep failures loud. Memoized per (D, H, wq, kvq).
    The front kernel is no longer probed: it lost the TPU acceptance gate
    and is only engaged explicitly by `tools/bench_megakernel.py`."""
    key = (D, H, wq, kvq)
    ok = _PROBE_OK.get(key)
    if ok is None:
        try:
            _probe(D, H, wq, kvq)
            ok = True
        except Exception as e:  # noqa: BLE001 — any lowering/runtime error
            logger.warning(
                "decoder tail megakernel disabled at D=%d H=%d wq=%s kvq=%s "
                "(probe failed: %s); decode falls back to the un-fused "
                "Pallas cross-attention path", D, H, wq, kvq, e)
            ok = False
        _PROBE_OK[key] = ok
    return ok


def _probe(D: int, H: int, wq: bool = False, kvq: bool = False) -> None:
    import numpy as np

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    Dh, TW, TT = D // H, _pick_tw(D), 512
    B, NT = 2, 2
    n_d, n4 = D // TW, 4 * D // TW
    rng = np.random.default_rng(0)

    def arr(*shape, scale=0.05):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale, dtype)

    def i8(*shape):
        return jnp.asarray(
            rng.integers(-127, 128, shape, dtype=np.int8))

    def sc(*shape):
        return jnp.full(shape, 0.01, jnp.float32)

    x = arr(B, 1, D)
    so = arr(B, H, 1, Dh)
    NTOT = 3 * n_d + 2 * n4
    w = i8(1, NTOT, D, TW) if wq else arr(1, NTOT, D, TW)
    ws = sc(1, NTOT, TW) if wq else None
    if kvq:
        k5, v5 = i8(1, B, NT, H, Dh, TT), i8(1, B, NT, H, Dh, TT)
        ks, vs = sc(1, B, NT, H, TT), sc(1, B, NT, H, TT)
    else:
        k5, v5 = arr(1, B, NT, H, Dh, TT), arr(1, B, NT, H, Dh, TT)
        ks = vs = None
    out = fused_tail_layer(
        jnp.int32(0), x, so, w, arr(1, SMALL_ROWS + 4, D), k5, v5,
        tail_ws=ws, ks=ks, vs=vs, beams=1,
        ta_total=NT * TT - 100, interpret=None)
    # force execution (the tunnel defers async errors to the fetch)
    if not np.isfinite(np.asarray(out[0]).ravel()[:4]).all():
        raise FloatingPointError("megakernel probe produced non-finites")


def _pick_tw(D: int) -> int:
    """Largest lane-aligned tile width dividing D (<= 640); tiny test
    models (D < 128) use the full width."""
    best = 0
    for k in range(1, 6):
        if D % (128 * k) == 0 and 128 * k <= 640:
            best = 128 * k
    return best if best else D


def pack_tail_weights(params, cfg, quantize: bool = False):
    """Pre-pack the decoder tail weights for `fused_tail_layer`.

    Returns {"w": [L, NTOT, D, TW], "b": [L, SMALL_ROWS + 4, D]} where the
    tile axis holds, in order: o_w column tiles (D/TW), cq_w (D/TW), co_w
    (D/TW), fc1_w column tiles (4D/TW), fc2_w contraction tiles TRANSPOSED
    to [D, TW] (4D/TW) — one uniform tile shape so the kernel streams them
    through a single buffer. Built once per model load (~2x the decoder
    tail weights in HBM traffic); the original params stay authoritative
    for prefill and the scan driver.

    `quantize=True` returns {"w8": int8 [L, NTOT, D, TW], "ws": f32
    [L, NTOT, TW], "b"} instead: symmetric per-tile-column int8 (the D-long
    contraction column of each tile shares one scale), halving both the
    pack's HBM residency and the per-step weight stream (~36 -> ~18
    MB/layer on large-v3). The kernel folds the scale into each tile
    matmul's OUTPUT (col tiles) or into the activations (fc2 contraction
    tiles), so the MXU never sees a dequantized array — the quality knob
    counterpart of the reference's quantized-GGML decode
    (`/root/reference/src/model_manager.rs:162` model files ship q5_0/q8_0
    variants that whisper.cpp runs quantized in-kernel).
    """
    blk = params["decoder"]["blocks"]
    D = cfg.n_text_state
    TW = _pick_tw(D)
    L = blk["o_w"].shape[0]

    def col_tiles(w):  # [L, Din, Dout] -> [L, Dout//TW, Din, TW]
        Din, Dout = w.shape[1], w.shape[2]
        return jnp.transpose(
            w.reshape(L, Din, Dout // TW, TW), (0, 2, 1, 3))

    f2 = blk["fc2_w"]  # [L, 4D, D] -> contraction tiles [L, 4D//TW, D, TW]
    f2t = jnp.transpose(f2.reshape(L, 4 * D // TW, TW, D), (0, 1, 3, 2))
    w = jnp.concatenate(
        [col_tiles(blk["o_w"]), col_tiles(blk["cq_w"]),
         col_tiles(blk["co_w"]), col_tiles(blk["fc1_w"]), f2t],
        axis=1,
    )
    b = jnp.concatenate(
        [jnp.stack([blk["ln2_s"], blk["ln2_b"], blk["ln3_s"], blk["ln3_b"],
                    blk["o_b"], blk["cq_b"], blk["co_b"], blk["fc2_b"]],
                   axis=1),
         blk["fc1_b"].reshape(L, 4, D)],
        axis=1,
    )
    if not quantize:
        return {"w": w, "b": b}
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=2)  # [L, NTOT, TW]
    s = jnp.maximum(s, 1e-8) / 127.0
    w8 = jnp.clip(
        jnp.round(w.astype(jnp.float32) / s[:, :, None, :]), -127, 127
    ).astype(jnp.int8)
    return {"w8": w8, "ws": s.astype(jnp.float32), "b": b}


def _onehot_cols(n, kq, start, dtype):
    """[n, kq] one-hot selecting columns start..start+kq.

    Mosaic cannot prove dynamic LANE-dim slice offsets (`ref[:, pl.ds(b, k)]`
    with b = program_id) are 128-aligned and refuses to lower them; since
    these buffers are single lane-tiles already in VMEM, select columns with
    an exact 0/1 matmul instead (bf16 holds 0/1 exactly)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, kq), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, kq), 1)
    return (rows == start + cols).astype(dtype)


def _ln_t(v, g, beta, dtype, eps=1e-5):
    """Feature-major layernorm: v [D, R], normalize over axis 0 (f32 math,
    `models/whisper.py::_ln` transposed)."""
    xf = v.astype(jnp.float32)
    mu = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.var(xf, axis=0, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32)[:, None]
            + beta.astype(jnp.float32)[:, None]).astype(dtype)


def _tail_kernel(D, TW, n_d, n4, KQ, H, Dh, TT, ta_total, scale, wq, kvq,
                 l_ref, *refs):
    # optional-ref unpacking (wq = int8 weight tiles + per-column scales,
    # kvq = int8 cross K/V + per-position scales; both static trace flags)
    refs = list(refs)
    xT_ref, soT_ref, sm_ref = refs[:3]
    refs = refs[3:]
    ws_ref = refs.pop(0) if wq else None
    w_hbm = refs.pop(0)
    if kvq:
        k_ref, ks_ref, v_ref, vs_ref = refs[:4]
        refs = refs[4:]
    else:
        k_ref, v_ref = refs[:2]
        ks_ref = vs_ref = None
        refs = refs[2:]
    (o_ref, wbuf, x1T, cqT, coT, m_ref, l2_ref, acc_ref, sems) = refs

    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    l = l_ref[0]
    dtype = x1T.dtype

    def stream(tile_ids, consume):
        """3-slot round-robin pipelined weight-tile stream: slot i%3 is
        re-filled only after its previous consumer's (synchronous) reads
        have issued — the guide's double-buffer discipline, depth 3."""
        n = len(tile_ids)

        def dma(i):
            return pltpu.make_async_copy(
                w_hbm.at[l, tile_ids[i]], wbuf.at[i % N_SLOTS],
                sems.at[i % N_SLOTS])

        for i in range(min(N_SLOTS - 1, n)):
            dma(i).start()
        for i in range(n):
            if i + N_SLOTS - 1 < n:
                dma(i + N_SLOTS - 1).start()
            dma(i).wait()
            consume(i, tile_ids[i], wbuf[i % N_SLOTS])

    def col_mm(wt, tid, act):
        """[D, TW] tile x [D, N] activations -> [TW, N] f32; int8 tiles
        fold their per-column scale into the OUTPUT rows (output row r =
        tile column r), so the MXU never sees a dequantized tile."""
        y = jax.lax.dot_general(
            wt.astype(dtype) if wq else wt, act,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if wq:
            y = y * ws_ref[0, tid].astype(jnp.float32)[:, None]
        return y

    # ---- front phase: o-projection + residual, ln2, cross-q projection
    @pl.when((b == 0) & (t == 0))
    def _front():
        sm = sm_ref[0]  # [SMALL_ROWS + 4, D]
        soflat = soT_ref[...].reshape(D, soT_ref.shape[2])  # [D, N] major
        h2 = [None]

        def consume(i, tid, wt):
            if i < n_d:  # o_w tile i -> x1T columns
                j = i
                y = col_mm(wt, tid, soflat)
                y = y + sm[4, j * TW:(j + 1) * TW].astype(
                    jnp.float32)[:, None]
                x1T[j * TW:(j + 1) * TW, :] = (
                    xT_ref[j * TW:(j + 1) * TW, :] + y.astype(dtype))
            else:  # cq_w tile -> cqT columns
                j = i - n_d
                if h2[0] is None:
                    h2[0] = _ln_t(x1T[...], sm[0], sm[1], dtype)
                y = col_mm(wt, tid, h2[0])
                y = y + sm[5, j * TW:(j + 1) * TW].astype(
                    jnp.float32)[:, None]
                cqT[j * TW:(j + 1) * TW, :] = y.astype(dtype)

        stream(list(range(2 * n_d)), consume)

    # ---- flash cross-attention for stream b, K/V tile t (the math of
    # pallas_attn.py::_flash_kernel / _flash_kernel_q8, queries
    # feature-major; int8 K/V scales fold into scores / probabilities) ----
    @pl.when(t == 0)
    def _reset():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l2_ref[:] = jnp.zeros_like(l2_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k = k_ref[0, 0, 0]  # [H, Dh, TT] (bf16, or int8 when kvq)
    v = v_ref[0, 0, 0]
    sel = _onehot_cols(cqT.shape[1], KQ, b * KQ, dtype)
    qT = jax.lax.dot_general(  # [D, KQ] — dynamic-lane gather via one-hot
        cqT[...], sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qh = qT.reshape(H, Dh, KQ) * scale
    s = jax.lax.dot_general(
        qh.astype(dtype), k.astype(dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, KQ, TT]
    if kvq:
        s = s * ks_ref[0, 0, 0][:, None, :]  # per-position key scales
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=2)
    s = jnp.where((t * TT + col) < ta_total, s, -jnp.inf)

    m_prev = m_ref[:]  # [H, KQ]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :, None])
    l2_ref[:] = l2_ref[:] * alpha + jnp.sum(p, axis=-1)
    if kvq:
        p = p * vs_ref[0, 0, 0][:, None, :]  # value scales fold into probs
    pv = jax.lax.dot_general(
        p.astype(dtype), v.astype(dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [H, KQ, Dh]
    acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv
    m_ref[:] = m_new

    @pl.when(t == n_t - 1)
    def _finalize():
        out = acc_ref[:] / l2_ref[:][:, :, None]  # [H, KQ, Dh]
        out_t = jnp.transpose(out, (0, 2, 1)).astype(dtype)  # [H, Dh, KQ]
        nn = coT.shape[2]
        # dynamic-lane scatter: expand this b's KQ columns to [H, Dh, N]
        # via the one-hot transpose and merge under a lane mask
        out_n = jax.lax.dot_general(
            out_t, _onehot_cols(nn, KQ, b * KQ, dtype),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nn), 2)
        mask = (lane >= b * KQ) & (lane < (b + 1) * KQ)
        coT[...] = jnp.where(mask, out_n, coT[...])

    # ---- tail phase: co-projection + residual, ln3, MLP + residual ----
    @pl.when((b == n_b - 1) & (t == n_t - 1))
    def _tail():
        sm = sm_ref[0]
        coflat = coT[...].reshape(D, coT.shape[2])  # [D, N]
        h3 = [None]
        h4 = [None]
        mlp_acc = [jnp.zeros((D, coT.shape[2]), jnp.float32)]

        def consume(i, tid, wt):
            if i < n_d:  # co_w tile -> x1T residual update
                j = i
                y = col_mm(wt, tid, coflat)
                y = y + sm[6, j * TW:(j + 1) * TW].astype(
                    jnp.float32)[:, None]
                x1T[j * TW:(j + 1) * TW, :] = (
                    x1T[j * TW:(j + 1) * TW, :] + y.astype(dtype))
            elif (i - n_d) % 2 == 0:  # fc1 column tile j
                j = (i - n_d) // 2
                if h3[0] is None:
                    h3[0] = _ln_t(x1T[...], sm[2], sm[3], dtype)
                y = col_mm(wt, tid, h3[0])  # [TW, N]
                # fc1 bias: flat slice [j*TW, (j+1)*TW) of the 4D vector,
                # packed as rows SMALL_ROWS.. of the smalls bundle (TW
                # divides D so a tile never straddles rows)
                row = SMALL_ROWS + (j * TW) // D
                colo = (j * TW) % D
                y = y + sm[row, colo:colo + TW].astype(jnp.float32)[:, None]
                h4[0] = jax.nn.gelu(y).astype(dtype)
            else:  # fc2 contraction tile j (transposed to [D, TW]); int8
                # per-column scales are per CONTRACTION element here, so
                # they fold into the activations instead of the output
                h4v = h4[0]
                if wq:
                    h4v = (h4v.astype(jnp.float32)
                           * ws_ref[0, tid].astype(jnp.float32)[:, None]
                           ).astype(dtype)
                mlp_acc[0] = mlp_acc[0] + jax.lax.dot_general(
                    wt.astype(dtype) if wq else wt, h4v,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        ids = list(range(2 * n_d, 3 * n_d))  # co tiles
        for j in range(n4):  # interleave fc1_j, fc2_j
            ids.append(3 * n_d + j)
            ids.append(3 * n_d + n4 + j)
        stream(ids, consume)
        y = mlp_acc[0] + sm[7].astype(jnp.float32)[:, None]  # + fc2_b
        o_ref[...] = x1T[...] + y.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("beams", "ta_total", "interpret"))
def fused_tail_layer(
    layer_idx,          # scalar int32 — which layer's weights/K/V
    x: jnp.ndarray,     # [N, 1, D] hidden after self-attention's residual input
    self_out: jnp.ndarray,  # [N, H, 1, Dh] self-attention output (pre o-proj)
    tail_w: jnp.ndarray,    # [L, NTOT, D, TW] pack "w" (bf16) or "w8" (int8)
    tail_b: jnp.ndarray,    # [L, SMALL_ROWS+4, D] pack_tail_weights()["b"]
    k5: jnp.ndarray,    # [L, B, NT, H, Dh, TT] pre-tiled cross keys
    v5: jnp.ndarray,    #   (bf16 "k5"/"v5", or int8 "k8"/"v8" with ks/vs)
    tail_ws: jnp.ndarray | None = None,  # [L, NTOT, TW] f32 int8 tile scales
    ks: jnp.ndarray | None = None,  # [L, B, NT, H, TT] f32 key scales
    vs: jnp.ndarray | None = None,  # [L, B, NT, H, TT] f32 value scales
    beams: int = 1,
    ta_total: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One fused decoder-layer tail -> new hidden [N, 1, D].

    int8 variants (each independent): pass `pack_tail_weights(quantize=
    True)`'s w8/ws as tail_w/tail_ws to stream the weight tiles quantized;
    pass `tile_quantize_cross_kv` payloads + scales as k5/v5/ks/vs to
    stream the cross cache quantized (same math as
    `pallas_attn._flash_kernel_q8`)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ta_total is None:
        ta_total = k5.shape[2] * k5.shape[5]
    wq = tail_w.dtype == jnp.int8
    kvq = k5.dtype == jnp.int8
    if wq != (tail_ws is not None) or kvq != (ks is not None):
        raise ValueError("int8 payloads and their scales must come together")
    N, _, D = x.shape
    L, B, NT, H, Dh, TT = k5.shape
    KQ = beams
    NTOT, TW = tail_w.shape[1], tail_w.shape[3]
    n_d = D // TW
    n4 = (NTOT - 3 * n_d) // 2
    scale = float(Dh) ** -0.5

    xT = x[:, 0].T  # [D, N]
    soT = jnp.transpose(self_out[:, :, 0], (1, 2, 0))  # [H, Dh, N]
    l_arr = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    kv_spec = pl.BlockSpec((1, 1, 1, H, Dh, TT),
                           lambda b, t, l: (l[0], b, t, 0, 0, 0))
    kv_scale_spec = pl.BlockSpec((1, 1, 1, H, TT),
                                 lambda b, t, l: (l[0], b, t, 0, 0))
    in_specs = [
        pl.BlockSpec((D, N), lambda b, t, l: (0, 0)),
        pl.BlockSpec((H, Dh, N), lambda b, t, l: (0, 0, 0)),
        pl.BlockSpec((1, SMALL_ROWS + 4, D), lambda b, t, l: (l[0], 0, 0)),
    ]
    operands = [xT, soT, tail_b]
    if wq:
        in_specs.append(
            pl.BlockSpec((1, NTOT, TW), lambda b, t, l: (l[0], 0, 0)))
        operands.append(tail_ws)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(tail_w)
    if kvq:
        in_specs += [kv_spec, kv_scale_spec, kv_spec, kv_scale_spec]
        operands += [k5, ks, v5, vs]
    else:
        in_specs += [kv_spec, kv_spec]
        operands += [k5, v5]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NT),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((D, N), lambda b, t, l: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, D, TW), tail_w.dtype),  # weight tiles
            pltpu.VMEM((D, N), x.dtype),                 # x1T residual
            pltpu.VMEM((D, N), x.dtype),                 # cross queries
            pltpu.VMEM((H, Dh, N), x.dtype),             # cross outputs
            pltpu.VMEM((H, KQ), jnp.float32),            # flash running max
            pltpu.VMEM((H, KQ), jnp.float32),            # flash normalizer
            pltpu.VMEM((H, KQ, Dh), jnp.float32),        # flash accumulator
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )
    outT = pl.pallas_call(
        functools.partial(
            _tail_kernel, D, TW, n_d, n4, KQ, H, Dh, TT, int(ta_total),
            scale, wq, kvq),
        out_shape=jax.ShapeDtypeStruct((D, N), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(l_arr, *operands)
    return outT.T[:, None, :]
