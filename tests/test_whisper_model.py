import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_diarize_tpu.models import whisper as wm


TINY_TEST_CFG = wm.WhisperConfig(
    n_mels=80, n_vocab=51865,
    n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
    n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return wm.init_params(TINY_TEST_CFG, seed=0)


@pytest.fixture(scope="module")
def xa(params):
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((2, 80, 3000)), jnp.float32)
    return wm.encode(params, mel, TINY_TEST_CFG)


def test_presets_cover_reference_models():
    # the models the reference's DTW preset map names (`transcribe.rs:117-129`)
    for name in ["tiny.en", "tiny", "base.en", "base", "small.en", "small",
                 "medium.en", "medium", "large-v3", "large-v3-turbo"]:
        assert name in wm.PRESETS
        assert name in wm.ALIGNMENT_HEADS
    assert wm.PRESETS["large-v3"].n_mels == 128
    assert wm.PRESETS["large-v3"].n_vocab == 51866
    assert wm.PRESETS["large-v3-turbo"].n_text_layer == 4
    assert wm.PRESETS["base.en"].multilingual is False
    assert wm.PRESETS["tiny"].n_audio_state == 384


def test_alignment_heads_fallback_to_small():
    cfg = wm.PRESETS["base"]
    heads = wm.alignment_heads_for("not-a-model", cfg)
    # small preset clamped to base's 6 layers / 8 heads
    assert heads and all(l < 6 and h < 8 for l, h in heads)


def test_alignment_heads_strip_quant_suffix():
    """Quantized model names (as shipped on ggerganov/whisper.cpp) resolve
    their base model's alignment heads — a deliberate improvement over the
    reference's silent fallback to Small (`transcribe.rs:128`)."""
    cfg = wm.PRESETS["large-v3-turbo"]
    for name in ("large-v3-turbo-q5_0", "large-v3-turbo-q8_0",
                 "large-v3-turbo-q5_1", "large-v3-turbo-q4_0"):
        assert wm.alignment_heads_for(name, cfg) == \
            wm.alignment_heads_for("large-v3-turbo", cfg)
    # unknown bases still fall back to small; exact names keep priority
    base = wm.PRESETS["base"]
    assert wm.alignment_heads_for("nope-q5_0", base) == \
        wm.alignment_heads_for("not-a-model", base)


def test_encode_shape(xa):
    assert xa.shape == (2, 1500, 64)
    assert np.isfinite(np.asarray(xa)).all()


@pytest.mark.slow
def test_incremental_decode_matches_teacher_forced(params, xa):
    """Prefill + per-token cached steps must equal the nocache forward."""
    cfg = TINY_TEST_CFG
    rng = np.random.default_rng(2)
    S = 7
    tokens = jnp.asarray(rng.integers(0, 50000, (2, S)), jnp.int32)

    ref_logits = wm.decoder_forward_nocache(params, cfg, tokens, xa)

    cache = wm.init_self_cache(cfg, 2, xa.dtype)
    cc = wm.cross_kv(params, xa, cfg)
    # prefill first 4 tokens, then 3 single steps
    logits_a, cache = wm.decode_step(params, cfg, tokens[:, :4], jnp.int32(0), cache, cc)
    outs = [logits_a]
    for i in range(4, S):
        logits_i, cache = wm.decode_step(
            params, cfg, tokens[:, i : i + 1], jnp.int32(i), cache, cc
        )
        outs.append(logits_i)
    inc_logits = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(inc_logits), np.asarray(ref_logits), atol=2e-3, rtol=1e-3
    )


def test_alignment_cross_attn(params, xa):
    cfg = TINY_TEST_CFG
    tokens = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
    heads = [(0, 1), (1, 0)]
    w = wm.alignment_cross_attn(params, cfg, tokens, xa, heads)
    assert w.shape == (2, 2, 4, 1500)
    # scaled QK logits (softmax happens on the host AFTER frame slicing):
    # finite, and softmaxing them gives valid distributions
    wn = np.asarray(w)
    assert np.isfinite(wn).all()
    probs = np.exp(wn - wn.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_detect_language_logits(params, xa):
    logits = wm.detect_language_logits(params, TINY_TEST_CFG, xa, sot_id=50258)
    assert logits.shape == (2, 51865)
    assert np.isfinite(np.asarray(logits)).all()


def test_sinusoids():
    pos = wm.sinusoids(1500, 64)
    assert pos.shape == (1500, 64)
    np.testing.assert_allclose(pos[0, :32], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pos[0, 32:], 1.0, atol=1e-7)  # cos(0)


def test_encoder_compact_probs_accuracy(params):
    """bf16 params trigger compact (bf16) attention-prob buffers; the
    encoder output must stay close to the f32 reference."""
    import jax

    cfg = TINY_TEST_CFG
    mel = jnp.asarray(
        np.random.default_rng(9).standard_normal((1, 80, 3000)), jnp.float32
    )
    ref = wm.encode(params, mel, cfg)  # f32 params -> full-precision path
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    out = wm.encode(pbf, mel.astype(jnp.bfloat16), cfg).astype(jnp.float32)
    # bf16 weights themselves dominate the error budget; compact probs must
    # not blow it up
    err = float(jnp.abs(ref - out).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.1 * scale, (err, scale)


@pytest.mark.slow
def test_decode_step_unroll_parity(params, xa):
    """The unrolled layer driver (static weight slices, used on the TPU
    sampling hot path) must be numerically identical to the lax.scan path
    — plain cross cache, row-padded prompts, and beam-folded batches."""
    cfg = TINY_TEST_CFG
    cc = wm.cross_kv(params, xa, cfg)
    B = xa.shape[0]

    # plain S=1
    cache0 = wm.init_self_cache(cfg, B, xa.dtype, 64)
    tok = jnp.asarray([[11], [13]], jnp.int32)
    for extra in (dict(), dict(row_pad=jnp.asarray([0, 2], jnp.int32))):
        l_s, c_s = wm.decode_step(
            params, cfg, tok, jnp.int32(3), cache0, cc, **extra)
        l_u, c_u = wm.decode_step(
            params, cfg, tok, jnp.int32(3), cache0, cc, unroll=True, **extra)
        np.testing.assert_allclose(
            np.asarray(l_s), np.asarray(l_u), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(c_s["k"]), np.asarray(c_u["k"]), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(c_s["v"]), np.asarray(c_u["v"]), rtol=1e-6, atol=1e-6)

    # beam-folded rows sharing each stream's cross K/V
    K = 2
    cacheb = wm.init_self_cache(cfg, B * K, xa.dtype, 64)
    tokb = jnp.asarray([[11], [13], [17], [19]], jnp.int32)
    l_s, _ = wm.decode_step(
        params, cfg, tokb, jnp.int32(0), cacheb, cc, beams=K)
    l_u, _ = wm.decode_step(
        params, cfg, tokb, jnp.int32(0), cacheb, cc, beams=K, unroll=True)
    np.testing.assert_allclose(
        np.asarray(l_s), np.asarray(l_u), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_decode_step_split_parity(params, xa):
    """Beam sampling against the split prompt/decode cache must match the
    fused-cache decode_step exactly, including after a beam reindex."""
    cfg = TINY_TEST_CFG
    cc = wm.cross_kv(params, xa, cfg)
    B = xa.shape[0]
    K = 2
    N = B * K
    P = 4
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(10, 200, (B, P)), jnp.int32)
    row_pad = jnp.asarray([1, 0], jnp.int32)
    row_pad_n = jnp.repeat(row_pad, K, axis=0)

    # fused reference: replicated prefill + combined cache
    cache_f = wm.init_self_cache(cfg, N, xa.dtype, P + 16)
    lf, cache_f = wm.decode_step(
        params, cfg, jnp.repeat(prompt, K, axis=0), jnp.int32(0), cache_f,
        cc, beams=K, row_pad=row_pad_n)

    # split: per-stream prefill + empty decode half
    pcache = wm.init_self_cache(cfg, B, xa.dtype, P)
    ls, pcache = wm.decode_step(
        params, cfg, prompt, jnp.int32(0), pcache, cc, row_pad=row_pad)
    dcache = wm.init_split_decode_cache(cfg, N, xa.dtype, 16)
    np.testing.assert_allclose(
        np.asarray(jnp.repeat(ls[:, -1], K, axis=0)), np.asarray(lf[:, -1]),
        rtol=1e-5, atol=1e-5)

    toks = [jnp.asarray(rng.integers(10, 200, (N, 1)), jnp.int32)
            for _ in range(3)]
    perm = jnp.asarray([1, 0, 2, 3], jnp.int32)  # swap stream 0's beams

    for step, tok in enumerate(toks):
        if step == 2:  # beam reindex between steps 1 and 2
            cache_f = jax.tree.map(lambda a: a[:, perm], cache_f)
            dcache = jax.tree.map(lambda a: a[:, perm], dcache)
            tok = tok  # tokens already per new rows
        lf, cache_f = wm.decode_step(
            params, cfg, tok, jnp.int32(P + step), cache_f, cc, beams=K,
            row_pad=row_pad_n)
        ls, dcache = wm.decode_step_split(
            params, cfg, tok, jnp.int32(step), pcache, dcache, cc, P,
            beams=K, row_pad=row_pad_n)
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lf), rtol=1e-5, atol=1e-5)
        # unrolled split driver agrees (re-running the step overwrites the
        # same slot with the same K/V, so the advanced dcache is reusable)
        ls_u, _ = wm.decode_step_split(
            params, cfg, tok, jnp.int32(step), pcache, dcache, cc, P,
            beams=K, row_pad=row_pad_n, unroll=True)
        np.testing.assert_allclose(
            np.asarray(ls_u), np.asarray(ls), rtol=1e-5, atol=1e-5)
    # final decode-cache contents must equal the fused cache's decode slots
    np.testing.assert_allclose(
        np.asarray(dcache["k"][:, :, :, :3]),
        np.asarray(cache_f["k"][:, :, :, P:P+3]), rtol=1e-5, atol=1e-5)


def test_cross_kv_tiled_parity(params, xa):
    """Direct-to-tiled cross K/V must match tile_cross_cache(cross_kv(...))
    on every valid audio position (padded tail differs by design: K=0/V=bias
    there, masked by all consumers)."""
    cfg = TINY_TEST_CFG
    ref = wm.tile_cross_cache(wm.cross_kv(params, xa, cfg))
    out = wm.cross_kv_tiled(params, xa, cfg)
    assert out["k5"].shape == ref["k5"].shape
    L, B, NT, H, Dh, TT = ref["k5"].shape
    # valid flat positions < Ta
    valid = (np.arange(NT)[:, None] * TT + np.arange(TT)[None, :]) < cfg.n_audio_ctx
    for key in ("k5", "v5"):
        a = np.asarray(ref[key], np.float32)
        b = np.asarray(out[key], np.float32)
        m = valid[None, None, :, None, None, :]  # mask padded tail
        np.testing.assert_allclose(
            np.where(m, a, 0.0), np.where(m, b, 0.0), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_decode_step_split_ancestry_parity(params, xa):
    """Gather-free ancestry indirection must reproduce the explicit
    decode-cache gather exactly across steps and beam reindexes."""
    cfg = TINY_TEST_CFG
    cc = wm.cross_kv(params, xa, cfg)
    B = xa.shape[0]
    K = 2
    N = B * K
    P = 3
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(10, 200, (B, P)), jnp.int32)
    pcache = wm.init_self_cache(cfg, B, xa.dtype, P)
    _, pcache = wm.decode_step(params, cfg, prompt, jnp.int32(0), pcache, cc)

    # explicit-gather run (reference)
    dc_g = wm.init_split_decode_cache(cfg, N, xa.dtype, 16)
    # ancestry run: cache never permuted
    dc_a = wm.init_split_decode_cache(cfg, N, xa.dtype, 16)
    anc = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, 16)).copy()

    perms = [jnp.asarray(p, jnp.int32) for p in
             ([0, 1, 2, 3], [1, 1, 3, 2], [0, 1, 3, 3], [1, 0, 2, 3])]
    for step in range(4):
        perm = perms[step]
        # reference: permute the cache rows, then decode
        dc_g = jax.tree.map(lambda a: a[:, perm], dc_g)
        # ancestry: permute only the index map; slot `step` will be self
        anc = anc[perm].at[:, step].set(jnp.arange(N, dtype=jnp.int32))
        tok = jnp.asarray(rng.integers(10, 200, (N, 1)), jnp.int32)
        lg, dc_g = wm.decode_step_split(
            params, cfg, tok, jnp.int32(step), pcache, dc_g, cc, P, beams=K)
        la, dc_a = wm.decode_step_split(
            params, cfg, tok, jnp.int32(step), pcache, dc_a, cc, P, beams=K,
            anc=anc)
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lg), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_decode_step_pos_parity(params, xa):
    """Per-row-position decode (speculative rounds) must reproduce
    decode_step exactly when all rows share the same position, and must
    place K/V at each row's own slots when they differ."""
    cfg = TINY_TEST_CFG
    cc = wm.cross_kv(params, xa, cfg)
    B = xa.shape[0]
    rng = np.random.default_rng(11)
    toks = jnp.asarray(rng.integers(10, 200, (B, 3)), jnp.int32)
    cache0 = wm.init_self_cache(cfg, B, xa.dtype, 32)

    # uniform positions == scalar decode_step
    l_ref, c_ref = wm.decode_step(params, cfg, toks, jnp.int32(4), cache0, cc)
    l_pos, c_pos = wm.decode_step_pos(
        params, cfg, toks, jnp.full((B,), 4, jnp.int32), cache0, cc)
    np.testing.assert_allclose(
        np.asarray(l_pos), np.asarray(l_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c_pos["k"]), np.asarray(c_ref["k"]), rtol=1e-5, atol=1e-5)
    # unrolled driver agrees
    l_u, c_u = wm.decode_step_pos(
        params, cfg, toks, jnp.full((B,), 4, jnp.int32), cache0, cc,
        unroll=True)
    np.testing.assert_allclose(
        np.asarray(l_u), np.asarray(l_pos), rtol=1e-6, atol=1e-6)

    # diverged positions: row b's result equals a lone decode at its own pos
    pos = jnp.asarray([2, 6], jnp.int32)
    # pre-fill both rows' prefixes at their own positions so attention has
    # real history
    pre = jnp.asarray(rng.integers(10, 200, (B, 6)), jnp.int32)
    cache_a = cache0
    for j in range(6):
        _, cache_a = wm.decode_step_pos(
            params, cfg, pre[:, j:j+1],
            jnp.minimum(jnp.asarray([j, j], jnp.int32), pos), cache_a, cc)
    l_div, _ = wm.decode_step_pos(params, cfg, toks, pos, cache_a, cc)
    for b in range(B):
        cache_b = wm.init_self_cache(cfg, 1, xa.dtype, 32)
        ccb = jax.tree.map(lambda a: a[:, b:b+1], cc)
        for j in range(int(pos[b])):
            _, cache_b = wm.decode_step(
                params, cfg, pre[b:b+1, j:j+1], jnp.int32(j), cache_b, ccb)
        l_b, _ = wm.decode_step(
            params, cfg, toks[b:b+1], jnp.int32(int(pos[b])), cache_b, ccb)
        np.testing.assert_allclose(
            np.asarray(l_div[b]), np.asarray(l_b[0]), rtol=1e-4, atol=1e-4)
