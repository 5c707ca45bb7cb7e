import numpy as np
import pytest

from whisper_diarize_tpu.diarize import (
    EmbeddingManager,
    cosine_similarity,
    get_segments,
    spectral_cluster,
)
from whisper_diarize_tpu.models import campplus, segmentation


def test_segmentation_forward_shapes():
    params = segmentation.init_params(0)
    audio = np.random.default_rng(0).standard_normal(
        (1, segmentation.WINDOW_SAMPLES)
    ).astype(np.float32) * 0.1
    lp = np.asarray(segmentation.forward(params, audio))
    assert lp.shape[0] == 1 and lp.shape[2] == 7
    assert lp.shape[1] == segmentation.n_out_frames(segmentation.WINDOW_SAMPLES)
    # log-softmax rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-5)


def test_segmentation_sinc_window_toggle(monkeypatch):
    """The SincNet hamming-ramp convention is an explicit A/B toggle
    (VERDICT r3 item 9, docs/PARITY.md): both variants run with identical
    shapes, different numbers; env override selects the variant."""
    params = segmentation.init_params(0)
    audio = (np.random.default_rng(2)
             .standard_normal((1, segmentation.WINDOW_SAMPLES)) * 0.1
             ).astype(np.float32)
    lp_s = np.asarray(segmentation.forward(params, audio,
                                           sinc_window="sincnet"))
    lp_t = np.asarray(segmentation.forward(params, audio,
                                           sinc_window="torch"))
    lp_h = np.asarray(segmentation.forward(params, audio,
                                           sinc_window="hann"))
    assert lp_s.shape == lp_t.shape == lp_h.shape
    # the two hamming-ramp samplings nearly coincide (documented in
    # _sinc_kernel): a sincnet-vs-torch mismatch cannot explain a parity
    # failure on its own
    np.testing.assert_allclose(lp_s, lp_t, rtol=0, atol=1e-2)
    # the hann family genuinely differs
    assert not np.allclose(lp_s, lp_h)
    np.testing.assert_array_equal(
        np.asarray(segmentation.forward(params, audio)), lp_s)  # default
    monkeypatch.setenv("WDT_SINC_WINDOW", "hann")
    np.testing.assert_array_equal(
        np.asarray(segmentation.forward(params, audio)), lp_h)
    import pytest

    with pytest.raises(ValueError, match="window_mode"):
        segmentation.forward(params, audio, sinc_window="blackman")


def test_powerset_to_activity():
    lp = np.full((1, 4, 7), -10.0)
    lp[0, 0, 0] = 0.0  # silence
    lp[0, 1, 1] = 0.0  # s1
    lp[0, 2, 4] = 0.0  # s1+s2
    lp[0, 3, 6] = 0.0  # s2+s3
    act = segmentation.powerset_to_activity(lp)
    assert act.shape == (1, 4, 3)
    assert not act[0, 0].any()
    assert act[0, 1].tolist() == [True, False, False]
    assert act[0, 2].tolist() == [True, True, False]
    assert act[0, 3].tolist() == [False, True, True]


def test_get_segments_structure():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(16000 * 12) * 3000).astype(np.int16)
    segs = get_segments(x, 16000)
    for s in segs:
        assert s.end > s.start
        assert s.samples.dtype == np.int16
        assert len(s.samples) == pytest.approx((s.end - s.start) * 16000, abs=2)
    # sorted within the stream
    starts = [s.start for s in segs]
    assert starts == sorted(starts)


def test_get_segments_rejects_wrong_rate():
    with pytest.raises(ValueError):
        get_segments(np.zeros(100, np.int16), 8000)


def test_embedding_manager_reference_policy():
    m = EmbeddingManager(max_speakers=2)
    e1 = np.array([1.0, 0.0, 0.0])
    e2 = np.array([0.0, 1.0, 0.0])
    e3 = np.array([0.9, 0.1, 0.0])
    # first embedding creates speaker 1
    assert m.search_speaker(e1, 0.5) == 1
    # orthogonal embedding creates speaker 2
    assert m.search_speaker(e2, 0.5) == 2
    # similar to speaker 1 -> assigned 1, centroid updated
    assert m.search_speaker(e3, 0.5) == 1
    assert m.speakers[1].count == 2
    # at capacity, a dissimilar embedding returns None from search_speaker
    e4 = np.array([0.0, 0.0, 1.0])
    assert m.search_speaker(e4, 0.5) is None
    # ... and the engine switches to get_best_speaker_match
    assert m.get_best_speaker_match(e4) in (1, 2)
    assert len(m.get_all_speakers()) == 2


def test_embedding_manager_empty():
    m = EmbeddingManager(max_speakers=0)
    assert m.search_speaker(np.ones(3), 0.5) is None
    assert m.get_best_speaker_match(np.ones(3)) is None


def test_cosine_similarity():
    assert cosine_similarity(np.array([1.0, 0]), np.array([1.0, 0])) == pytest.approx(1.0)
    assert cosine_similarity(np.array([1.0, 0]), np.array([0, 1.0])) == pytest.approx(0.0)
    assert cosine_similarity(np.zeros(2), np.ones(2)) == 0.0


@pytest.mark.slow
def test_campplus_embedding_shapes():
    params = campplus.init_params(0)
    rng = np.random.default_rng(2)
    seg = (rng.standard_normal(16000) * 3000).astype(np.int16)
    emb = campplus.compute_embedding(params, seg)
    assert emb.shape == (campplus.EMB_DIM,)
    assert np.isfinite(emb).all()


@pytest.mark.slow
def test_campplus_batch_matches_single():
    params = campplus.init_params(0)
    rng = np.random.default_rng(3)
    segs = [
        (rng.standard_normal(16000) * 3000).astype(np.int16),
        (rng.standard_normal(8000) * 3000).astype(np.int16),
    ]
    batch = campplus.compute_embeddings_batch(params, segs)
    assert batch.shape == (2, campplus.EMB_DIM)
    single0 = campplus.compute_embedding(params, segs[0])
    # padded+masked batch must reproduce the unpadded single-segment result
    np.testing.assert_allclose(batch[0], single0, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_campplus_short_segment():
    params = campplus.init_params(0)
    emb = campplus.compute_embedding(params, np.zeros(100, np.int16))
    assert np.isfinite(emb).all()


def test_spectral_cluster_two_clear_speakers():
    rng = np.random.default_rng(4)
    a = rng.standard_normal(32) * 0.05 + np.eye(32)[0] * 3
    b = rng.standard_normal(32) * 0.05 + np.eye(32)[1] * 3
    embs = np.stack([a + rng.standard_normal(32) * 0.05 for _ in range(10)]
                    + [b + rng.standard_normal(32) * 0.05 for _ in range(10)])
    labels = spectral_cluster(embs, max_speakers=8)
    assert len(set(labels.tolist())) == 2
    assert len(set(labels[:10].tolist())) == 1
    assert len(set(labels[10:].tolist())) == 1


def test_spectral_cluster_edge_cases():
    assert spectral_cluster(np.zeros((0, 8))).shape == (0,)
    assert spectral_cluster(np.ones((1, 8))).tolist() == [0]


def test_get_segments_batch_matches_serial(monkeypatch):
    """Cross-stream batched segmentation must reproduce the per-stream
    results. The net forward is monkeypatched to a deterministic function
    of the window content: with random weights the powerset argmax sits on
    near-ties that flip between batch-size-specific XLA compilations, which
    would test float fusion order instead of the batching bookkeeping."""
    from whisper_diarize_tpu import diarize as dz

    def fake_forward(params, windows):
        windows = np.asarray(windows)
        nf = segmentation.n_out_frames(windows.shape[1])
        fs = segmentation.FRAME_STEP_SAMPLES
        out = np.full((windows.shape[0], nf, 7), -10.0, np.float32)
        for w in range(windows.shape[0]):
            for f in range(nf):
                frame = windows[w, f * fs: (f + 1) * fs]
                loud = np.abs(frame).mean() > 0.05
                out[w, f, 1 if loud else 0] = 0.0
        return out

    monkeypatch.setattr(dz.segmentation, "forward", fake_forward)
    params = segmentation.init_params(0)
    rng = np.random.default_rng(5)
    streams = [
        (rng.standard_normal(n) * 8000).astype(np.int16)
        for n in (160000, 200000, 40000)
    ] + [np.zeros(0, np.int16)]
    serial = [dz.get_segments(x, 16000, params) for x in streams]
    # serial path goes through the batch helper too — drive the multi-
    # stream window bookkeeping explicitly and compare
    batched = dz.get_segments_batch(streams, 16000, params)
    assert len(batched) == len(serial)
    assert any(len(r) > 0 for r in serial)  # fixture produces segments
    for ref, out in zip(serial, batched):
        assert [(s.start, s.end) for s in out] == [
            (s.start, s.end) for s in ref
        ]
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(a.samples, b.samples)


def test_segmentation_forward_batch_consistency():
    """The real forward over a concatenated window batch stays numerically
    close to per-stream batches (same math; only fusion order differs)."""
    params = segmentation.init_params(0)
    rng = np.random.default_rng(6)
    w1 = rng.standard_normal((2, segmentation.WINDOW_SAMPLES)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((3, segmentation.WINDOW_SAMPLES)).astype(np.float32) * 0.1
    full = np.asarray(segmentation.forward(params, np.concatenate([w1, w2])))
    p1 = np.asarray(segmentation.forward(params, w1))
    p2 = np.asarray(segmentation.forward(params, w2))
    np.testing.assert_allclose(full, np.concatenate([p1, p2]), atol=2e-4)


def test_get_segments_batch_window_bound(monkeypatch):
    """With MAX_WINDOWS_PER_BATCH forcing several chunked dispatches (and
    power-of-two bucket padding), results must match the unbounded pass."""
    from whisper_diarize_tpu import diarize as dz

    def fake_forward(params, windows):
        windows = np.asarray(windows)
        nf = segmentation.n_out_frames(windows.shape[1])
        fs = segmentation.FRAME_STEP_SAMPLES
        out = np.full((windows.shape[0], nf, 7), -10.0, np.float32)
        for w in range(windows.shape[0]):
            for f in range(nf):
                frame = windows[w, f * fs: (f + 1) * fs]
                loud = np.abs(frame).mean() > 0.05
                out[w, f, 1 if loud else 0] = 0.0
        return out

    monkeypatch.setattr(dz.segmentation, "forward", fake_forward)
    params = segmentation.init_params(0)
    rng = np.random.default_rng(11)
    W = segmentation.WINDOW_SAMPLES
    streams = [
        (rng.standard_normal(n) * 8000).astype(np.int16)
        for n in (3 * W + 1000, W // 2, 2 * W)
    ]
    unbounded = dz.get_segments_batch(streams, 16000, params)
    monkeypatch.setattr(dz, "MAX_WINDOWS_PER_BATCH", 2)
    chunked = dz.get_segments_batch(streams, 16000, params)
    assert len(chunked) == len(unbounded)
    assert any(len(r) > 0 for r in unbounded)
    for ref, out in zip(unbounded, chunked):
        assert [(s.start, s.end) for s in out] == [
            (s.start, s.end) for s in ref
        ]
