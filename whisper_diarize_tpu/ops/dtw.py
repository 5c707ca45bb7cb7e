"""DTW word-timestamp alignment over cross-attention, TPU-first.

Replaces whisper.cpp's DTW machinery (enabled by the reference at
`/root/reference/src/transcribe.rs:115-136` with per-model alignment-head
presets, consumed per token as `t_dtw` at `transcribe.rs:273-306`).

Pipeline (openai-whisper `find_alignment` semantics, step for step):
  1. take the scaled QK logits of the checkpoint's alignment heads for the
     final token sequence (one teacher-forced pass,
     `models/whisper.py::alignment_cross_attn`),
  2. slice frames to the valid audio length, THEN softmax over frames —
     the row normalizer must only see real audio,
  3. standardize over tokens (mean / biased std, per head-frame column),
  4. median-filter along the frame axis (width 7, reflect padding),
  5. average heads → cost matrix [S_text, T_frames],
  6. monotonic DTW through -cost; a token's anchor time is the first frame
     its row is entered (a "jump"), at 20 ms per encoder frame.

TPU-native detail: the DTW DP recurrence
    c[i,j] = x[i,j] + min(c[i-1,j], c[i-1,j-1], c[i,j-1])
is sequential in j, but each row is a *min-plus linear recurrence*:
    c[j] = min(a[j], x[j] + c[j-1]),  a[j] = x[j] + min(c_prev[j], c_prev[j-1])
whose function composition is associative — so each row is a
`jax.lax.associative_scan` and the whole matrix is a `lax.scan` over rows.
The O(N+M) backtrack walks the (small, ~2.7 MB max) cost matrix on the host.
The DTW memory model the reference exposes (`utils.rs:3-49`) is kept as
`utils.calculate_dtw_mem_size` for API parity; this implementation needs
only the N×M f32 cost matrix.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

FRAME_SECONDS = 0.02  # one encoder position = 2 mel frames = 20 ms


def median_filter(x, width: int = 7) -> np.ndarray:
    """Median filter along the last axis with REFLECT padding (openai's
    `timing.median_filter` semantics). Host numpy — the DTW cost pipeline
    runs on attention already fetched from the device."""
    x = np.asarray(x)
    if width <= 1 or x.shape[-1] <= width // 2:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    idx = np.arange(x.shape[-1])[:, None] + np.arange(width)[None, :]
    windows = xp[..., idx]  # [..., T, width]
    return np.median(windows, axis=-1)


@jax.jit
def dtw_cost_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Accumulated-cost matrix for monotonic DTW over x [N, M] (f32).

    Row recurrence solved with an associative min-plus scan; rows iterated
    with lax.scan. Boundary: c[0, j] = prefix-sum along row 0 (only "left"
    moves available), c[i, 0] = column prefix-sum.
    """
    x = x.astype(jnp.float32)
    N, M = x.shape

    def combine(f, g):
        # function h(v) = min(a, s + v); compose g∘f
        a_f, s_f = f
        a_g, s_g = g
        return jnp.minimum(a_g, s_g + a_f), s_g + s_f

    def row_step(c_prev, x_row):
        # b[j] = min(c_prev[j], c_prev[j-1]); b[0] uses +inf on the left
        shifted = jnp.concatenate([jnp.full((1,), jnp.inf), c_prev[:-1]])
        b = jnp.minimum(c_prev, shifted)
        a = x_row + b
        # scan elements are functions (a[j], x[j]) acting on the running cost
        A, S = jax.lax.associative_scan(combine, (a, x_row))
        # c[j] = min(a[j], x[j] + c[j-1]) with c[-1] = +inf → c = A
        return A, A

    row0 = jnp.cumsum(x[0])
    _, rows = jax.lax.scan(row_step, row0, x[1:])
    return jnp.concatenate([row0[None], rows], axis=0)


def dtw_backtrack(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Walk the accumulated-cost matrix from (N-1, M-1) back to (0, 0).

    Returns (text_indices, time_indices) of every cell on the optimal path,
    in forward order. Ties prefer the diagonal (match), then up, then left.
    """
    N, M = cost.shape
    i, j = N - 1, M - 1
    ti, tj = [i], [j]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            diag = cost[i - 1, j - 1]
            up = cost[i - 1, j]
            left = cost[i, j - 1]
            m = min(diag, up, left)
            if m == diag:
                i -= 1
                j -= 1
            elif m == up:
                i -= 1
            else:
                j -= 1
        ti.append(i)
        tj.append(j)
    return np.array(ti[::-1], np.int64), np.array(tj[::-1], np.int64)


def dtw_path(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Full DTW over a cost matrix [N, M].

    Prefers the native C++ DP (`native/wdt_native.cpp::dtw_full`) — at
    whisper sizes (<= 448 x 1500) the host DP beats a device round-trip —
    falling back to the on-device associative-scan DP + host backtrack."""
    from .. import native

    if native.is_available():
        out = native.dtw_path(np.asarray(x, np.float32))
        if out is not None:
            return out
    cost = np.asarray(dtw_cost_matrix(jnp.asarray(x)))
    return dtw_backtrack(cost)


def alignment_cost(
    qk: np.ndarray,  # [K, S, Ta] scaled QK logits of the alignment heads
    n_frames: int,  # valid encoder frames (audio_len / 320)
    medfilt_width: int = 7,
) -> np.ndarray:
    """Slice + softmax + standardize + filter + head-average QK logits into a
    DTW cost matrix [S, n_frames].

    Order matches openai's `find_alignment` exactly: frames are SLICED to the
    valid range *before* the softmax (the per-row normalizer must only see
    real audio), standardization is over tokens with the biased std (f32,
    like openai's torch path), and the median filter uses reflect padding.
    """
    qk = np.asarray(qk, np.float32)[:, :, : max(int(n_frames), 1)]
    qk = qk - qk.max(axis=-1, keepdims=True)
    w = np.exp(qk)
    w /= w.sum(axis=-1, keepdims=True)
    mean = w.mean(axis=1, keepdims=True)
    std = w.std(axis=1, keepdims=True)  # biased (torch.std_mean unbiased=False)
    w = (w - mean) / np.maximum(std, 1e-9)
    w = median_filter(w, medfilt_width)
    matrix = w.mean(axis=0)  # [S, n_frames]
    return np.asarray(-matrix, np.float32)


@functools.partial(jax.jit, static_argnames=("medfilt_width",))
def alignment_cost_batch(
    qk: jnp.ndarray,  # [B, K, S, Ta] scaled QK logits
    n_frames: jnp.ndarray,  # [B] valid encoder frames per row
    n_rows: jnp.ndarray = None,  # [B] valid token rows (sot+text+eot); None=all
    medfilt_width: int = 7,
) -> jnp.ndarray:
    """Batched ON-DEVICE version of `alignment_cost` → [B, S, Ta] f32.

    Fetching raw attention maps off-chip costs ~40 MB per batch over the
    tunneled TPU link; reducing to the cost matrix on device cuts the
    transfer ~K·medfilt-fold. Numerically identical inside the valid region:
    masking pad frames to -inf before the softmax IS openai's frame slice
    (same per-row normalizer), standardization is per frame-column over the
    VALID token rows (openai standardizes over the full teacher-forced
    sequence — sot + text + eot — and slices rows after), and the median
    filter reflects at each row's own n_frames boundary. Columns >= n_frames
    / rows >= n_rows are garbage — the host slices them off before DTW.
    """
    B, K, S, Ta = qk.shape
    cols = jnp.arange(Ta)
    frame_ok = cols[None, None, None, :] < n_frames[:, None, None, None]
    logits = jnp.where(frame_ok, qk.astype(jnp.float32), -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)  # pad columns -> exact zeros
    if n_rows is None:
        mean = jnp.mean(w, axis=2, keepdims=True)  # over tokens, per column
        std = jnp.std(w, axis=2, keepdims=True)
    else:
        row_ok = (jnp.arange(S)[None, None, :, None]
                  < n_rows[:, None, None, None]).astype(w.dtype)
        cnt = jnp.maximum(row_ok.sum(axis=2, keepdims=True), 1.0)
        mean = (w * row_ok).sum(axis=2, keepdims=True) / cnt
        var = (jnp.square(w - mean) * row_ok).sum(axis=2, keepdims=True) / cnt
        std = jnp.sqrt(var)
    w = (w - mean) / jnp.maximum(std, 1e-9)

    # median filter along frames, reflect-padded at each row's own boundary
    pad = medfilt_width // 2
    taps = cols[:, None] + jnp.arange(-pad, pad + 1)[None, :]  # [Ta, W]
    taps = jnp.abs(taps)  # left reflect at 0
    last = (n_frames - 1)[:, None, None]  # [B, 1, 1]
    taps_b = last - jnp.abs(last - taps[None, :, :])  # right reflect at n-1
    taps_b = jnp.clip(taps_b, 0, Ta - 1)  # pad columns: keep in range

    def medfilt_row(wb, tapsb):  # wb [K, S, Ta]; tapsb [Ta, W]
        return jnp.median(wb[:, :, tapsb], axis=-1)

    w = jax.vmap(medfilt_row)(w, taps_b)
    return -jnp.mean(w, axis=1)  # [B, S, Ta]


@functools.partial(jax.jit, static_argnames=("sot_len",))
def dtw_anchor_frames_batch(
    cost: jnp.ndarray,  # [B, S, Ta] alignment_cost_batch output
    n_tok: jnp.ndarray,  # [B] sampled text tokens per row (DP rows)
    n_frames: jnp.ndarray,  # [B] valid encoder frames per row
    sot_len: int,
) -> jnp.ndarray:
    """Batched DTW DP + backtrack FULLY on device → anchor frames [B, N] i32.

    anchors[b, r] = first audio frame whose path cell enters text-token row
    r (the "jump" rule of `anchor_times_from_cost`) for the submatrix
    cost[b, sot_len : sot_len + n_tok[b], : n_frames[b]] — exactly the
    slice the host path feeds `dtw_path`. Rows >= n_tok are unvisited and
    read 0.

    With the cost matrix already reduced on device
    (`alignment_cost_batch`), running the DP (associative min-plus scan,
    `dtw_cost_matrix`) and the O(N+M) backtrack (a `lax.scan` pointer walk
    over the accumulated-cost matrix) on device means only [B, N] i32
    anchors (~KBs) ever cross the host link instead of the [B, S, Ta] f32
    cost matrix (~MBs) — on a tunneled/PCIe-remote TPU the fetch dominates
    the host DP. Tie-breaking matches the host walk exactly (diagonal,
    then up, then left; `native/wdt_native.cpp::dtw_full`).

    ULP-divergence caveat (ADVICE r3): this path accumulates the min-plus
    DP with an associative scan while the host fallback (WDT_HOST_DTW=1)
    runs a sequential DP — f32 summation GROUPING differs, so accumulated
    costs can differ by a few ULPs. Near-exact ties in the backtrack's
    (diag <= up <= left) comparisons can then flip and shift an anchor by
    one frame (20 ms). Equivalence tests against the host path therefore
    use a <=1-frame tolerance rather than exact equality.
    """
    B, S, Ta = cost.shape
    N = S - sot_len
    x = cost[:, sot_len:, :].astype(jnp.float32)
    n_tok = jnp.clip(n_tok.astype(jnp.int32), 1, N)  # [B]
    # clip like n_tok (ADVICE r3): n_frames > Ta would start the backtrack
    # at an out-of-range column (dynamic_slice clamps silently) and record
    # anchor frames >= Ta
    nf = jnp.clip(n_frames.astype(jnp.int32), 1, Ta)
    # zero garbage cells (rows >= n_tok / cols >= n_frames): the DP
    # recurrence only ever pulls from up/left, so valid cells never read
    # them, but NaNs there would poison the row prefix scans
    rows_ok = jnp.arange(N)[None, :, None] < n_tok[:, None, None]
    cols_ok = jnp.arange(Ta)[None, None, :] < nf[:, None, None]
    x = jnp.where(rows_ok & cols_ok, x, 0.0)
    c = jax.vmap(dtw_cost_matrix)(x)  # [B, N, Ta]

    def walk(cb, nt, nfb):  # cb [N, Ta]
        def step(carry, _):
            i, j, anchors = carry
            # record BEFORE moving: the backward walk visits each path cell
            # once, overwriting each row's anchor with ever-smaller j — the
            # final value is the row's first-entered frame
            anchors = anchors.at[i].set(j)
            at_top = i == 0
            at_left = j == 0
            done = at_top & at_left
            im = jnp.maximum(i - 1, 0)
            jm = jnp.maximum(j - 1, 0)
            s = jax.lax.dynamic_slice(cb, (im, jm), (2, 2))
            inf = jnp.float32(jnp.inf)
            diag = jnp.where(at_top | at_left, inf, s[0, 0])
            up = jnp.where(
                at_top, inf, jnp.where(at_left, s[0, 0], s[0, 1]))
            left = jnp.where(
                at_left, inf, jnp.where(at_top, s[0, 0], s[1, 0]))
            take_diag = (diag <= up) & (diag <= left)
            take_up = (~take_diag) & (up <= left)
            ni = jnp.where(take_diag | take_up, i - 1, i)
            nj = jnp.where(take_diag | ~take_up, j - 1, j)
            ni = jnp.where(done, 0, ni)
            nj = jnp.where(done, 0, nj)
            return (ni, nj, anchors), None

        init = (nt - 1, nfb - 1, jnp.zeros((N,), jnp.int32))
        # path length <= nt + nfb - 1 <= N + Ta - 1; one extra step records
        # the terminal (0, 0) cell
        (_, _, anchors), _ = jax.lax.scan(step, init, None, length=N + Ta)
        return anchors

    return jax.vmap(walk)(c, n_tok, nf)


def token_anchor_times(
    qk: np.ndarray,  # [K, S, Ta] scaled QK logits
    n_frames: int,
    medfilt_width: int = 7,
) -> np.ndarray:
    """Per-token DTW anchor times in seconds (length S).

    anchor[k] = time of the first path cell in token row k — the equivalent
    of whisper.cpp's per-token `t_dtw` consumed at `transcribe.rs:273-274`.
    """
    cost_np = alignment_cost(qk, n_frames, medfilt_width)
    return anchor_times_from_cost(cost_np, qk.shape[1])


def anchor_times_from_cost(cost_np: np.ndarray, S: int) -> np.ndarray:
    """DTW + jump extraction over a precomputed [S, n_frames] cost matrix
    (the device path: `alignment_cost_batch` → host fetch → here)."""
    text_idx, time_idx = dtw_path(cost_np)
    anchors = np.zeros((S,), np.float64)
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    jump_rows = text_idx[jumps]
    jump_times = time_idx[jumps] * FRAME_SECONDS
    for r, t in zip(jump_rows, jump_times):
        anchors[r] = t
    # rows never entered by a jump (shouldn't happen) inherit previous anchor
    seen = set(jump_rows.tolist())
    for k in range(1, S):
        if k not in seen:
            anchors[k] = max(anchors[k], anchors[k - 1])
    return anchors
