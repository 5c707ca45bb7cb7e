import numpy as np
import jax.numpy as jnp
import pytest

from whisper_diarize_tpu.ops import dtw as dtw_ops
from whisper_diarize_tpu.transcribe import (
    interpolate_word_timestamps,
    is_whole_control_token,
    token_spans,
)


def _reference_dtw_cost(x):
    """Naive O(NM) python DP for cross-checking the scan implementation."""
    N, M = x.shape
    c = np.full((N, M), np.inf)
    c[0] = np.cumsum(x[0])
    for i in range(1, N):
        for j in range(M):
            best = c[i - 1, j]
            if j > 0:
                best = min(best, c[i - 1, j - 1], c[i, j - 1])
            c[i, j] = x[i, j] + best
    return c


def test_dtw_cost_matrix_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.random((12, 20)).astype(np.float32)
    ours = np.asarray(dtw_ops.dtw_cost_matrix(jnp.asarray(x)))
    ref = _reference_dtw_cost(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_dtw_path_identity_diagonal():
    # strongly diagonal cost: path should be the diagonal
    N = 8
    x = np.ones((N, N), np.float32) * 10
    np.fill_diagonal(x, 0.0)
    ti, tj = dtw_ops.dtw_path(x)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == N - 1 and tj[-1] == N - 1
    on_diag = [(a, b) for a, b in zip(ti, tj) if a == b]
    assert len(on_diag) == N


def test_dtw_path_monotone():
    rng = np.random.default_rng(1)
    x = rng.random((10, 30)).astype(np.float32)
    ti, tj = dtw_ops.dtw_path(x)
    assert (np.diff(ti) >= 0).all()
    assert (np.diff(tj) >= 0).all()
    assert (np.diff(ti) + np.diff(tj) > 0).all()


def test_median_filter():
    x = jnp.asarray([[1.0, 100.0, 2.0, 3.0, 4.0, -50.0, 5.0]])
    y = np.asarray(dtw_ops.median_filter(x, 3))
    assert y.shape == x.shape
    assert y[0, 1] == 2.0  # spike removed
    assert y[0, 5] == 4.0


def test_token_anchor_times_synthetic():
    """QK logits concentrated on a moving diagonal -> anchors increase."""
    S, Ta = 6, 100
    qk = np.zeros((2, S, Ta), np.float32)
    centers = [5, 20, 35, 50, 65, 80]
    for s, c in enumerate(centers):
        qk[:, s, c - 2 : c + 3] = 8.0
    anchors = dtw_ops.token_anchor_times(qk, Ta)
    assert anchors.shape == (S,)
    assert (np.diff(anchors) > 0).all()
    # each token's onset lies between its predecessor's attention center and
    # its own (between bands the costs tie, so the path may enter a row
    # early; row 0 is always entered at t=0 since the path starts at (0,0))
    for s, c in list(enumerate(centers))[1:]:
        assert centers[s - 1] * 0.02 <= anchors[s] <= c * 0.02 + 0.06, (
            s, anchors[s], c * 0.02,
        )


def test_token_anchor_times_respects_frame_mask():
    """With only half the frames valid, anchors stay inside the valid range."""
    S, Ta = 4, 100
    qk = np.zeros((1, S, Ta), np.float32)
    # attention mass in the padded half only -> must be sliced away
    qk[:, :, 80:] = 9.0
    anchors = dtw_ops.token_anchor_times(qk, 50)
    assert (anchors <= 50 * 0.02 + 1e-6).all()


def test_token_anchor_mae_within_20ms():
    """Known ground-truth alignment -> anchor MAE <= 20 ms (one encoder
    frame), the BASELINE.md word-timestamp target (VERDICT r1 item 7).

    Each token s owns the frame span [onsets[s], onsets[s+1]); its QK logits
    peak uniformly over that span. The DTW onset must recover onsets[s]."""
    onsets = [0, 12, 30, 41, 77, 90, 120]  # frame indices; last = end
    S = len(onsets) - 1
    Ta = 150  # > valid 120: exercises the slice too
    rng = np.random.default_rng(0)
    qk = rng.standard_normal((3, S, Ta)).astype(np.float32) * 0.05
    for s in range(S):
        qk[:, s, onsets[s]: onsets[s + 1]] += 6.0
    anchors = dtw_ops.token_anchor_times(qk, 120)
    truth = np.array(onsets[:-1], np.float64) * dtw_ops.FRAME_SECONDS
    mae = np.abs(anchors - truth).mean()
    assert mae <= 0.020 + 1e-9, (mae, anchors, truth)


def test_alignment_cost_batch_matches_host():
    """The on-device batched cost (masked softmax + masked standardization +
    boundary-reflect median filter) must equal the host reference inside the
    valid region, for differing per-row n_frames."""
    rng = np.random.default_rng(7)
    B, K, S, Ta = 3, 2, 12, 60
    qk = rng.standard_normal((B, K, S, Ta)).astype(np.float32)
    n_frames = np.array([60, 37, 9], np.int32)

    dev = np.asarray(dtw_ops.alignment_cost_batch(
        jnp.asarray(qk), jnp.asarray(n_frames)
    ))
    for b in range(B):
        ref = dtw_ops.alignment_cost(qk[b], int(n_frames[b]))
        np.testing.assert_allclose(
            dev[b][:, : n_frames[b]], ref, atol=2e-5, rtol=1e-4,
        )


def test_alignment_cost_batch_row_masking():
    """Pad token rows excluded from the standardization must not change the
    valid rows' cost."""
    rng = np.random.default_rng(8)
    B, K, S, Ta = 1, 2, 10, 40
    qk = rng.standard_normal((B, K, S, Ta)).astype(np.float32)
    n_rows = np.array([6], np.int32)

    base = np.asarray(dtw_ops.alignment_cost_batch(
        jnp.asarray(qk), jnp.asarray([40], np.int32), jnp.asarray(n_rows)
    ))
    poisoned = qk.copy()
    poisoned[:, :, 6:, :] += 100.0  # junk in the pad rows
    out = np.asarray(dtw_ops.alignment_cost_batch(
        jnp.asarray(poisoned), jnp.asarray([40], np.int32), jnp.asarray(n_rows)
    ))
    np.testing.assert_allclose(out[:, :6], base[:, :6], atol=1e-6)


def test_alignment_cost_slices_before_softmax():
    """The frame slice must happen BEFORE the softmax: huge logits in the
    padded region must not distort the valid columns' normalization."""
    S, Ta, n_valid = 3, 40, 20
    rng = np.random.default_rng(2)
    base = rng.standard_normal((2, S, Ta)).astype(np.float32)
    poisoned = base.copy()
    poisoned[:, :, n_valid:] += 50.0  # would dominate a pre-slice softmax
    a = dtw_ops.alignment_cost(base, n_valid)
    b = dtw_ops.alignment_cost(poisoned, n_valid)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert a.shape == (S, n_valid)


def test_interpolate_word_timestamps():
    ws = interpolate_word_timestamps("hello big world", 1.0, 4.0)
    assert [w.text for w in ws] == ["hello", "big", "world"]
    assert ws[0].start == 1.0
    assert ws[-1].end == 4.0
    # weights 5,3,5 over 3.0 s
    assert ws[0].end == pytest.approx(1.0 + 3.0 * 5 / 13)
    assert ws[1].end == pytest.approx(1.0 + 3.0 * 8 / 13)
    # punctuation-only words weigh 1
    ws2 = interpolate_word_timestamps("a -", 0.0, 1.0)
    assert ws2[0].end == pytest.approx(0.5)
    assert interpolate_word_timestamps("", 0.0, 1.0) == []
    assert interpolate_word_timestamps("x", 1.0, 1.0) == []


def test_is_whole_control_token():
    assert is_whole_control_token("[_BEG_]")
    assert is_whole_control_token("[_TT_320]")
    assert is_whole_control_token("  [_SOT_] ")
    assert not is_whole_control_token("[_]")
    assert not is_whole_control_token("[BEG]")
    assert not is_whole_control_token("hello")
    assert not is_whole_control_token("[_lower_]")


def test_token_spans_midpoint_rule():
    texts = ["a", "b", "c"]
    probs = [0.9, 0.8, 0.7]
    anchors = [1.0, 2.0, 4.0]
    t0s = [0.0, 0.0, 0.0]
    t1s = [9.0, 9.0, 9.0]
    spans = token_spans(texts, probs, anchors, t0s, t1s)
    # first token start falls back to t0 (no left anchor)
    assert spans[0].start == 0.0
    assert spans[0].end == pytest.approx(1.5)
    assert spans[1].start == pytest.approx(1.5)
    assert spans[1].end == pytest.approx(3.0)
    assert spans[2].start == pytest.approx(3.0)
    assert spans[2].end == 9.0  # no right anchor -> t1


def test_token_spans_no_anchors_fallback():
    spans = token_spans(["x", "y"], [0.5, 0.5], [None, None], [0.0, 1.0], [1.0, 2.0])
    assert spans[0].start == 0.0 and spans[0].end == 1.0
    assert spans[1].start == 1.0 and spans[1].end == 2.0


def test_dtw_anchor_frames_batch_matches_host():
    """Device DP + backtrack == host `anchor_times_from_cost` per row.

    Integer-valued costs keep every DP sum exact in f32 so the device
    associative-scan DP and the host sequential DP compute bit-identical
    matrices; the backtrack tie-break (diag, up, left) matches by
    construction, so the paths — and anchors — must agree exactly."""
    rng = np.random.default_rng(7)
    B, S, Ta, sot_len = 4, 24, 41, 3
    cost = rng.integers(0, 9, size=(B, S, Ta)).astype(np.float32)
    n_tok = rng.integers(1, S - sot_len + 1, size=(B,)).astype(np.int32)
    n_frames = rng.integers(4, Ta + 1, size=(B,)).astype(np.int32)
    n_rows = np.minimum(sot_len + n_tok + 1, S).astype(np.int32)
    frames = np.asarray(
        dtw_ops.dtw_anchor_frames_batch(
            jnp.asarray(cost), jnp.asarray(n_tok), jnp.asarray(n_frames),
            sot_len,
        )
    )
    for b in range(B):
        nt = int(n_tok[b])
        sub = np.ascontiguousarray(
            cost[b][sot_len: sot_len + nt, : n_frames[b]]
        )
        host = dtw_ops.anchor_times_from_cost(sub, nt)
        dev = frames[b, :nt].astype(np.float64) * dtw_ops.FRAME_SECONDS
        np.testing.assert_allclose(dev, host, rtol=0, atol=0)
        # unused rows read 0
        assert (frames[b, nt:] == 0).all()
    _ = n_rows  # standardization rows are exercised via the engine path


def test_dtw_anchor_frames_batch_float_costs():
    """Continuous costs: anchors still match the host walk (no exact ties
    at the argmin on generic float inputs)."""
    rng = np.random.default_rng(11)
    B, S, Ta, sot_len = 3, 18, 33, 2
    cost = rng.standard_normal((B, S, Ta)).astype(np.float32)
    n_tok = np.array([S - sot_len, 5, 1], np.int32)
    n_frames = np.array([Ta, 9, 3], np.int32)
    frames = np.asarray(
        dtw_ops.dtw_anchor_frames_batch(
            jnp.asarray(cost), jnp.asarray(n_tok), jnp.asarray(n_frames),
            sot_len,
        )
    )
    for b in range(B):
        nt = int(n_tok[b])
        sub = np.ascontiguousarray(
            cost[b][sot_len: sot_len + nt, : n_frames[b]]
        )
        host = dtw_ops.anchor_times_from_cost(sub, nt)
        dev = frames[b, :nt].astype(np.float64) * dtw_ops.FRAME_SECONDS
        np.testing.assert_allclose(dev, host, rtol=0, atol=0)
