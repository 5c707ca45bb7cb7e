import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops.mel import N_SAMPLES
from whisper_diarize_tpu.parallel.batching import iter_batches, plan_windows
from whisper_diarize_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding_spec,
    shard_params,
)
from whisper_diarize_tpu.types import SpeechSegment


def seg(start, seconds, value=7):
    n = int(seconds * 16000)
    return SpeechSegment(
        start=start, end=start + seconds,
        samples=np.full(n, value, np.int16),
    )


def test_plan_windows_short_segments():
    segs = [seg(0.0, 2.0), seg(5.0, 3.0)]
    ws = plan_windows(segs)
    assert len(ws) == 2
    assert ws[0].chunk_idx == 0 and ws[0].window_idx == 0
    assert ws[1].chunk_idx == 1 and ws[1].start == 5.0
    assert len(ws[0].samples) == 32000


def test_plan_windows_splits_long_segment():
    segs = [seg(10.0, 70.0)]  # 70 s -> 30 + 30 + 10
    ws = plan_windows(segs)
    assert [w.window_idx for w in ws] == [0, 1, 2]
    assert [len(w.samples) for w in ws] == [N_SAMPLES, N_SAMPLES, 10 * 16000]
    assert ws[1].start == pytest.approx(40.0)
    assert ws[2].start == pytest.approx(70.0)


def test_plan_windows_skips_empty():
    segs = [SpeechSegment(0.0, 0.0, np.empty(0, np.int16)), seg(1.0, 1.0)]
    ws = plan_windows(segs)
    assert len(ws) == 1 and ws[0].chunk_idx == 1


def test_iter_batches_padding():
    segs = [seg(0.0, 1.0), seg(2.0, 1.0), seg(4.0, 1.0)]
    ws = plan_windows(segs)
    batches = list(iter_batches(ws, batch_size=2))
    assert len(batches) == 2
    group, audio, n_valid = batches[1]  # last batch: 1 real + 1 pad row
    assert len(group) == 1
    assert audio.shape == (2, N_SAMPLES)
    assert n_valid == [16000, 0]
    # padded rows are silent
    assert (audio[1] == 0).all()
    # scale: i16 -> [-1, 1)
    assert audio[0, 0] == pytest.approx(7 / 32768.0)


def test_param_sharding_rules():
    assert param_sharding_spec("decoder.blocks.q_w", 3) == P(None, None, "model")
    assert param_sharding_spec("decoder.blocks.o_w", 3) == P(None, "model", None)
    assert param_sharding_spec("decoder.blocks.fc1_w", 3) == P(None, None, "model")
    assert param_sharding_spec("decoder.blocks.fc2_w", 3) == P(None, "model", None)
    assert param_sharding_spec("decoder.blocks.q_b", 2) == P(None, "model")
    assert param_sharding_spec("decoder.tok_emb", 2) == P("model", None)
    assert param_sharding_spec("encoder.conv1_w", 3) == P()
    assert param_sharding_spec("decoder.blocks.ln1_s", 2) == P()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_params_places_on_mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    cfg = wm.WhisperConfig(
        n_mels=80, n_vocab=51872,
        n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    params = shard_params(wm.init_params(cfg), mesh)
    qw = params["decoder"]["blocks"]["q_w"]
    # column-parallel: out axis split over 2 model shards
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(2, 64, 32)}
    ow = params["decoder"]["blocks"]["o_w"]
    assert {s.data.shape for s in ow.addressable_shards} == {(2, 32, 64)}
    # replicated leaf: full shape everywhere
    ln = params["decoder"]["blocks"]["ln1_s"]
    assert {s.data.shape for s in ln.addressable_shards} == {(2, 64)}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_forward_matches_replicated():
    """TP-sharded encode must equal the single-device result."""
    import jax.numpy as jnp

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = wm.WhisperConfig(
        n_mels=80, n_vocab=51872,
        n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    params = wm.init_params(cfg, seed=0)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 80, 3000)), jnp.float32
    )
    ref = np.asarray(wm.encode(params, mel, cfg))

    sharded = shard_params(params, mesh)
    mel_sh = jax.device_put(mel, data_sharding(mesh, 3))
    out = np.asarray(jax.jit(lambda p, m: wm.encode(p, m, cfg))(sharded, mel_sh))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_graft_entry_dryrun_small():
    import __graft_entry__ as g

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    g.dryrun_multichip(2)


def test_plan_windows_multi_interleaves_streams():
    from whisper_diarize_tpu.parallel.batching import plan_windows_multi

    streams = [
        [seg(0.0, 1.0), seg(2.0, 1.0)],  # stream 0: 2 windows
        [seg(0.0, 1.0)],                  # stream 1: 1 window
        [seg(0.0, 1.0), seg(2.0, 1.0), seg(4.0, 1.0)],  # stream 2: 3
    ]
    ws = plan_windows_multi(streams)
    assert len(ws) == 6
    # round-robin: first slice covers every stream once
    assert [w.stream_idx for w in ws[:3]] == [0, 1, 2]
    # per-stream order preserved
    for s in range(3):
        mine = [w for w in ws if w.stream_idx == s]
        assert [(w.chunk_idx, w.window_idx) for w in mine] == sorted(
            (w.chunk_idx, w.window_idx) for w in mine
        )
