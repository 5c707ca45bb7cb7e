"""Parity tests for the fused decoder-tail megakernel (ops/pallas_tail.py).

The kernel must reproduce `models/whisper.py::_decoder_layer_tail` (with the
tiled Pallas cross-attention path) bit-closely in f32 interpret mode, for
greedy (beams=1) and beam-folded (beams>1) query shapes, including the
padded final cross K/V tile.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import pallas_tail
from whisper_diarize_tpu.ops.pallas_attn import tile_cross_kv

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import pallas_front  # noqa: E402 (quarantined FRONT kernel, tools/)


def _mk(cfg, B, beams, Ta, t_tile, seed=0):
    rng = np.random.default_rng(seed)
    params = wm.init_params(cfg, seed=seed)
    L, H, Dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim
    D = cfg.n_text_state
    N = B * beams
    x = jnp.asarray(rng.standard_normal((N, 1, D)), jnp.float32)
    so = jnp.asarray(rng.standard_normal((N, H, 1, Dh)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((L, B, H, Ta, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, H, Ta, Dh)), jnp.float32)
    k5, v5 = tile_cross_kv(k, v, t_tile=t_tile)
    return params, x, so, k5, v5


def _reference_tail(params, cfg, x, so, k5, v5, beams, layer):
    """The XLA/_cross_pallas path the kernel replaces."""
    cross_cache = {"k5": k5, "v5": v5}
    cross_fn, cross_select, _ = wm._cross_attend_factory(
        cfg, cross_cache, beams, x.dtype, 1)
    blk = jax.tree.map(lambda a: a[layer], params["decoder"]["blocks"])
    ck, cv = cross_select(layer)
    return wm._decoder_layer_tail(
        x, blk, so, cross_fn, ck, cv, jnp.int32(layer), cfg.n_text_head)


@pytest.mark.parametrize("beams,Ta,t_tile", [
    (1, 40, 16),   # greedy, padded final tile (40 = 2*16 + 8)
    (3, 32, 16),   # beam-folded queries, exact tiles
])
def test_fused_tail_matches_xla(beams, Ta, t_tile):
    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=Ta, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    B = 2
    params, x, so, k5, v5 = _mk(cfg, B, beams, Ta, t_tile)
    pack = pallas_tail.pack_tail_weights(params, cfg)
    for layer in range(cfg.n_text_layer):
        ref = _reference_tail(params, cfg, x, so, k5, v5, beams, layer)
        got = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, pack["w"], pack["b"], k5, v5,
            beams=beams, ta_total=Ta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pos,rp", [(5, (0, 0)), (7, (2, 0))])
def test_fused_front_matches_xla(pos, rp):
    """fused_front_layer must match _decoder_qkv + cache write + _attn on
    the greedy path (per-row prompt pads included)."""
    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=32, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    B, Tc = 2, 16
    H, Dh = cfg.n_text_head, cfg.head_dim
    rng = np.random.default_rng(7)
    params = wm.init_params(cfg, seed=7)
    x = jnp.asarray(rng.standard_normal((B, 1, cfg.n_text_state)), jnp.float32)
    kc = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, H, Tc, Dh)), jnp.float32)
    vc = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, H, Tc, Dh)), jnp.float32)
    row_pad = jnp.asarray(rp, jnp.int32)
    pack = pallas_front.pack_front_weights(params, cfg)

    # reference: the decode_step greedy-path mask (buffer slot `pos`)
    kpos = jnp.arange(Tc)[None, None, :]
    qpos = jnp.int32(pos)
    valid = (kpos <= qpos) & (
        (kpos >= row_pad[:, None, None]) | (kpos == qpos))
    mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None]

    for layer in range(cfg.n_text_layer):
        blk = jax.tree.map(lambda a: a[layer], params["decoder"]["blocks"])
        q, k_new, v_new = wm._decoder_qkv(x, blk, H)
        kc_w = kc.at[layer, :, :, pos].set(k_new[:, :, 0])
        vc_w = vc.at[layer, :, :, pos].set(v_new[:, :, 0])
        ref = wm._attn(q, kc_w[layer], vc_w[layer], mask)

        so, kn, vn = pallas_front.fused_front_layer(
            jnp.int32(layer), jnp.int32(pos), row_pad, x,
            pack["w"], pack["b"], kc, vc, interpret=True)
        np.testing.assert_allclose(
            np.asarray(kn), np.asarray(k_new), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vn), np.asarray(v_new), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(so), np.asarray(ref), rtol=2e-5, atol=2e-5)


def _attach_tail(params, cfg, front=True):
    extra = {"tail": pallas_tail.pack_tail_weights(params, cfg)}
    if front:
        extra["front"] = pallas_front.pack_front_weights(params, cfg)
    return {**params, "decoder": {**params["decoder"], **extra}}


def test_greedy_decode_tail_parity():
    """End-to-end greedy decode with the fused tail attached must produce
    the same tokens as the un-fused Pallas-cross path (interpret, f32)."""
    from tests.test_whisper_model import TINY_TEST_CFG
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    cfg = TINY_TEST_CFG
    params = wm.init_params(cfg, seed=3)
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 80, 3000)), jnp.float32)
    xa = wm.encode(params, mel, cfg)
    tk = DebugTokenizer()
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (2, 1)))
    dc = dec.DecodeConfig(
        max_tokens=10, blank_id=32, pallas_cross=True, unroll_layers=True)
    r0 = dec.greedy_decode(
        params, cfg, dc, tk.specials, xa, prompt, prompt.shape[1])
    r1 = dec.greedy_decode(
        _attach_tail(params, cfg), cfg, dc, tk.specials, xa, prompt,
        prompt.shape[1])
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))
    np.testing.assert_allclose(
        np.asarray(r0.token_probs), np.asarray(r1.token_probs),
        rtol=1e-4, atol=1e-5)
    # tail-only (no front pack) must also agree
    r2 = dec.greedy_decode(
        _attach_tail(params, cfg, front=False), cfg, dc, tk.specials, xa,
        prompt, prompt.shape[1])
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r2.tokens))


def test_beam_decode_tail_parity():
    from tests.test_whisper_model import TINY_TEST_CFG
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    cfg = TINY_TEST_CFG
    params = wm.init_params(cfg, seed=5)
    mel = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 80, 3000)), jnp.float32)
    xa = wm.encode(params, mel, cfg)
    tk = DebugTokenizer()
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (2, 1)))
    dc = dec.DecodeConfig(
        max_tokens=8, beam_size=3, blank_id=32, pallas_cross=True,
        unroll_layers=True)
    r0 = dec.beam_decode(
        params, cfg, dc, tk.specials, xa, prompt, prompt.shape[1])
    r1 = dec.beam_decode(
        _attach_tail(params, cfg), cfg, dc, tk.specials, xa, prompt,
        prompt.shape[1])
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))


def test_fused_tail_multi_tile_geometry(monkeypatch):
    """Force TW < D so the weight stream runs MULTIPLE tiles per matrix —
    the large-v3 production geometry (D=1280, TW=640 -> n_d=2, n4=8) in
    miniature (D=256, TW=128 -> n_d=2, n4=8): exercises the tile-index
    arithmetic, the fc1-bias row straddle, and the 3-slot round-robin with
    more tiles than slots."""
    monkeypatch.setattr(pallas_tail, "_pick_tw", lambda D: 128)
    monkeypatch.setattr(pallas_front, "_pick_tw", lambda D: 128)
    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=32, n_audio_state=256,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=256,
        n_text_head=4, n_text_layer=2,
    )
    B, beams, Ta, t_tile = 2, 1, 32, 16
    params, x, so, k5, v5 = _mk(cfg, B, beams, Ta, t_tile, seed=11)
    pack = pallas_tail.pack_tail_weights(params, cfg)
    assert pack["w"].shape[1] == 3 * 2 + 2 * 8  # n_d=2, n4=8
    for layer in range(cfg.n_text_layer):
        ref = _reference_tail(params, cfg, x, so, k5, v5, beams, layer)
        got = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, pack["w"], pack["b"], k5, v5,
            beams=beams, ta_total=Ta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # front kernel under the same multi-tile geometry
    Tc, H, Dh = 16, cfg.n_text_head, cfg.head_dim
    rng = np.random.default_rng(12)
    kc = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, H, Tc, Dh)), jnp.float32)
    vc = jnp.asarray(
        rng.standard_normal((cfg.n_text_layer, B, H, Tc, Dh)), jnp.float32)
    fpack = pallas_front.pack_front_weights(params, cfg)
    assert fpack["w"].shape[1] == 3 * 2
    pos, row_pad = 5, jnp.asarray([1, 0], jnp.int32)
    kpos = jnp.arange(Tc)[None, None, :]
    valid = (kpos <= pos) & ((kpos >= row_pad[:, None, None]) | (kpos == pos))
    mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
    xf = jnp.asarray(rng.standard_normal((B, 1, 256)), jnp.float32)
    for layer in range(cfg.n_text_layer):
        blk = jax.tree.map(lambda a: a[layer], params["decoder"]["blocks"])
        q, k_new, v_new = wm._decoder_qkv(xf, blk, H)
        kc_w = kc.at[layer, :, :, pos].set(k_new[:, :, 0])
        vc_w = vc.at[layer, :, :, pos].set(v_new[:, :, 0])
        ref = wm._attn(q, kc_w[layer], vc_w[layer], mask)
        so_g, kn, vn = pallas_front.fused_front_layer(
            jnp.int32(layer), jnp.int32(pos), row_pad, xf,
            fpack["w"], fpack["b"], kc, vc, interpret=True)
        np.testing.assert_allclose(
            np.asarray(kn), np.asarray(k_new), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vn), np.asarray(v_new), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(so_g), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_megakernels_supported_probe():
    """The per-geometry probe runs (interpret mode on CPU) and caches its
    verdict per (D, H); the default-on attach sites gate on it with the
    model's own decoder geometry."""
    pallas_tail._PROBE_OK = {}
    try:
        assert pallas_tail.megakernels_supported() is True
        assert pallas_tail._PROBE_OK[(1280, 20, False, False)] is True
        # the quantized variants probe independently (int8 tiles + scales)
        assert pallas_tail.megakernels_supported(
            1280, 20, wq=True, kvq=True) is True
        assert pallas_tail._PROBE_OK[(1280, 20, True, True)] is True
        # a second geometry probes independently (tiny fixture shapes)
        assert pallas_tail.megakernels_supported(128, 2) in (True, False)
        assert (128, 2, False, False) in pallas_tail._PROBE_OK
    finally:
        pallas_tail._PROBE_OK = {}


def _dequant_pack_into_params(params, cfg, pack):
    """Rewrite the tail projection weights with the q8 pack's dequantized
    values (inverting the tile packing), so an fp reference path computes
    with EXACTLY the numbers the q8 kernel streams."""
    D = cfg.n_text_state
    TW = pallas_tail._pick_tw(D)
    n_d, n4 = D // TW, 4 * D // TW
    w = np.asarray(pack["w8"], np.float32) * np.asarray(
        pack["ws"], np.float32)[:, :, None, :]  # [L, NTOT, D, TW]
    L = w.shape[0]

    def from_col_tiles(t0, n, dout):
        # [L, n, D, TW] -> [L, D, dout]
        return np.concatenate([w[:, t0 + j] for j in range(n)], axis=2)

    blk = dict(params["decoder"]["blocks"])
    blk["o_w"] = jnp.asarray(from_col_tiles(0, n_d, D))
    blk["cq_w"] = jnp.asarray(from_col_tiles(n_d, n_d, D))
    blk["co_w"] = jnp.asarray(from_col_tiles(2 * n_d, n_d, D))
    blk["fc1_w"] = jnp.asarray(from_col_tiles(3 * n_d, n4, 4 * D))
    f2 = np.concatenate(  # [L, D, TW] tiles -> [L, 4D, D]
        [np.transpose(w[:, 3 * n_d + n4 + j], (0, 2, 1)) for j in range(n4)],
        axis=1)
    blk["fc2_w"] = jnp.asarray(f2)
    return {**params, "decoder": {**params["decoder"], "blocks": blk}}


@pytest.mark.parametrize("beams", [1, 3])
def test_fused_tail_q8_weights(beams):
    """int8 weight tiles (scales folded into tile-matmul outputs /
    fc2 activations) must match the fp kernel run on the dequantized
    weights."""
    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=40, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    B, Ta, t_tile = 2, 40, 16
    params, x, so, k5, v5 = _mk(cfg, B, beams, Ta, t_tile, seed=21)
    qpack = pallas_tail.pack_tail_weights(params, cfg, quantize=True)
    assert qpack["w8"].dtype == jnp.int8
    # fp pack carrying exactly the dequantized values
    params_dq = _dequant_pack_into_params(params, cfg, qpack)
    fpack = pallas_tail.pack_tail_weights(params_dq, cfg)
    np.testing.assert_allclose(
        np.asarray(fpack["w"]),
        np.asarray(qpack["w8"], np.float32)
        * np.asarray(qpack["ws"])[:, :, None, :],
        rtol=1e-6, atol=1e-7)
    for layer in range(cfg.n_text_layer):
        ref = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, fpack["w"], fpack["b"], k5, v5,
            beams=beams, ta_total=Ta, interpret=True)
        got = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, qpack["w8"], qpack["b"], k5, v5,
            tail_ws=qpack["ws"], beams=beams, ta_total=Ta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("beams", [1, 3])
def test_fused_tail_q8_cross_kv(beams):
    """int8 cross K/V (scales folded into scores/probabilities, the
    `pallas_attn._flash_kernel_q8` math) must match the fp kernel on the
    dequantized cache."""
    from whisper_diarize_tpu.ops.pallas_attn import tile_quantize_cross_kv

    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=40, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    B, Ta, t_tile = 2, 40, 16
    rng = np.random.default_rng(23)
    params, x, so, _, _ = _mk(cfg, B, beams, Ta, t_tile, seed=23)
    L, H, Dh = cfg.n_text_layer, cfg.n_text_head, cfg.head_dim
    k = jnp.asarray(rng.standard_normal((L, B, H, Ta, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, H, Ta, Dh)), jnp.float32)
    k8, ks, v8, vs = tile_quantize_cross_kv(k, v, t_tile=t_tile)
    # dequantized fp tiles for the reference kernel
    k5 = jnp.asarray(k8, jnp.float32) * ks[:, :, :, :, None, :]
    v5 = jnp.asarray(v8, jnp.float32) * vs[:, :, :, :, None, :]
    pack = pallas_tail.pack_tail_weights(params, cfg)
    for layer in range(cfg.n_text_layer):
        ref = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, pack["w"], pack["b"], k5, v5,
            beams=beams, ta_total=Ta, interpret=True)
        got = pallas_tail.fused_tail_layer(
            jnp.int32(layer), x, so, pack["w"], pack["b"], k8, v8,
            ks=ks, vs=vs, beams=beams, ta_total=Ta, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_greedy_decode_tail_q8_kv_parity():
    """End-to-end: quantize_cross_kv decode with the tail kernel attached
    must produce the same tokens as the un-fused tiled-q8 einsum path (the
    quantization itself is identical; only the attention/tail fusion
    differs)."""
    from tests.test_whisper_model import TINY_TEST_CFG
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    cfg = TINY_TEST_CFG
    params = wm.init_params(cfg, seed=31)
    mel = jnp.asarray(
        np.random.default_rng(32).standard_normal((2, 80, 3000)), jnp.float32)
    xa = wm.encode(params, mel, cfg)
    tk = DebugTokenizer()
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (2, 1)))
    dc = dec.DecodeConfig(
        max_tokens=10, blank_id=32, pallas_cross=True, unroll_layers=True,
        quantize_cross_kv=True)
    r0 = dec.greedy_decode(
        params, cfg, dc, tk.specials, xa, prompt, prompt.shape[1])
    r1 = dec.greedy_decode(
        _attach_tail(params, cfg, front=False), cfg, dc, tk.specials, xa,
        prompt, prompt.shape[1])
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))
    np.testing.assert_allclose(
        np.asarray(r0.token_probs), np.asarray(r1.token_probs),
        rtol=1e-4, atol=1e-5)


def test_greedy_decode_tail_q8_weights_parity():
    """End-to-end wiring: a q8 weight pack attached to the params produces
    the same tokens as running the UN-fused path on params whose tail
    weights are the pack's dequantized values."""
    from tests.test_whisper_model import TINY_TEST_CFG
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    cfg = TINY_TEST_CFG
    params = wm.init_params(cfg, seed=33)
    qpack = pallas_tail.pack_tail_weights(params, cfg, quantize=True)
    params_dq = _dequant_pack_into_params(params, cfg, qpack)
    mel = jnp.asarray(
        np.random.default_rng(34).standard_normal((2, 80, 3000)), jnp.float32)
    tk = DebugTokenizer()
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(language="en"), np.int32), (2, 1)))
    dc = dec.DecodeConfig(
        max_tokens=10, blank_id=32, pallas_cross=True, unroll_layers=True)
    # reference: un-fused decode on the dequantized weights (prefill uses
    # the original qkv/embed weights either way; only the tail differs and
    # only on SAMPLING steps, which is exactly what the pack covers)
    xa_dq = wm.encode(params_dq, mel, cfg)
    r0 = dec.greedy_decode(
        params_dq, cfg, dc, tk.specials, xa_dq, prompt, prompt.shape[1])
    params_q8 = {
        **params_dq,
        "decoder": {**params_dq["decoder"], "tail": qpack},
    }
    r1 = dec.greedy_decode(
        params_q8, cfg, dc, tk.specials, xa_dq, prompt, prompt.shape[1])
    np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))


def test_tail_pack_attach_policy():
    """TranscribeStep attaches the megakernel pack per the TPU gate
    verdicts: fp greedy -> bf16 pack; int8 cross-KV -> NO pack (the plain
    q8 flash path measured faster); int8 cross-KV + explicit int8 weight
    tiles -> q8 pack; beam strategy -> never (HBM)."""
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.tokenizer import DebugTokenizer
    from whisper_diarize_tpu.transcribe import TranscribeStep

    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=51865, n_audio_ctx=32, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    params = wm.init_params(cfg, seed=41)
    tk = DebugTokenizer()

    def step(strategy="greedy", **kw):
        dc = dec.DecodeConfig(
            max_tokens=8, blank_id=32, pallas_cross=True, pallas_tail=True,
            **kw)
        return TranscribeStep(
            params, cfg, tk, decode_config=dc, strategy=strategy,
            enable_dtw=False)

    assert "tail" in step().params["decoder"]
    assert "w" in step().params["decoder"]["tail"]
    assert "tail" not in step(quantize_cross_kv=True).params["decoder"]
    q = step(quantize_cross_kv=True, quantize_tail_weights=True)
    assert q.params["decoder"]["tail"]["w8"].dtype == jnp.int8
    assert "tail" not in step(strategy="beam_search").params["decoder"]


def test_pack_tail_weights_tile_layout():
    cfg = wm.WhisperConfig(
        n_mels=8, n_vocab=64, n_audio_ctx=32, n_audio_state=32,
        n_audio_head=4, n_audio_layer=1, n_text_ctx=64, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    params = wm.init_params(cfg, seed=1)
    pack = pallas_tail.pack_tail_weights(params, cfg)
    D = cfg.n_text_state
    TW = pallas_tail._pick_tw(D)
    n_d, n4 = D // TW, 4 * D // TW
    blk = params["decoder"]["blocks"]
    w = np.asarray(pack["w"])
    assert w.shape[1] == 3 * n_d + 2 * n4
    # o_w tile 0 is the first TW output columns
    np.testing.assert_array_equal(w[:, 0], np.asarray(blk["o_w"][..., :TW]))
    # fc2 tiles are transposed contraction slices
    f2 = np.asarray(blk["fc2_w"])  # [L, 4D, D]
    np.testing.assert_array_equal(
        w[:, 3 * n_d + n4], np.transpose(f2[:, :TW, :], (0, 2, 1)))
    # fc1 bias rows follow the 8 small rows
    b = np.asarray(pack["b"])
    np.testing.assert_array_equal(
        b[:, pallas_tail.SMALL_ROWS:].reshape(b.shape[0], -1),
        np.asarray(blk["fc1_b"]))
