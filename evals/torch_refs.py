"""Independent torch implementations of the upstream model topologies.

Used as trusted references for numeric parity: tests randomize them and
compare the JAX forwards; `evals/parity.py` loads REAL upstream checkpoints
into them to verify the converted JAX nets against actual trained weights.

* CAM++: modelscope speakerlab DTDNN.py topology (vendored by wespeaker;
  source of the reference's `wespeaker_en_voxceleb_CAM++.onnx`,
  `/root/reference/src/engine.rs:91`).
* PyanNet: pyannote.audio segmentation-3.0 topology
  (`/root/reference/src/engine.rs:90`).
"""

from __future__ import annotations

import numpy as np


def _build_torch_campplus(torch):
    """The upstream CAM++ net (modelscope speakerlab DTDNN.py, vendored by
    wespeaker — the source of the reference's ONNX, `engine.rs:91`), built
    here as an independent torch implementation for numeric parity tests."""
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicResBlock(nn.Module):
        def __init__(self, in_planes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(in_planes, planes, 3, (stride, 1), 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.shortcut = nn.Sequential()
            if stride != 1 or in_planes != planes:
                self.shortcut = nn.Sequential(
                    nn.Conv2d(in_planes, planes, 1, (stride, 1), bias=False),
                    nn.BatchNorm2d(planes),
                )

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            out = out + self.shortcut(x)
            return F.relu(out)

    class FCM(nn.Module):
        def __init__(self, m_channels=32, feat_dim=80):
            super().__init__()
            self.conv1 = nn.Conv2d(1, m_channels, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(m_channels)
            self.layer1 = nn.Sequential(
                BasicResBlock(m_channels, m_channels, 2),
                BasicResBlock(m_channels, m_channels, 1),
            )
            self.layer2 = nn.Sequential(
                BasicResBlock(m_channels, m_channels, 2),
                BasicResBlock(m_channels, m_channels, 1),
            )
            self.conv2 = nn.Conv2d(m_channels, m_channels, 3, (2, 1), 1, bias=False)
            self.bn2 = nn.BatchNorm2d(m_channels)

        def forward(self, x):  # x [B, F, T]
            x = x.unsqueeze(1)
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.layer1(out)
            out = self.layer2(out)
            out = F.relu(self.bn2(self.conv2(out)))
            s = out.shape
            return out.reshape(s[0], s[1] * s[2], s[3])

    def nonlin(c):
        # upstream get_nonlinear names the submodules 'batchnorm'/'relu'
        seq = nn.Sequential()
        seq.add_module("batchnorm", nn.BatchNorm1d(c))
        seq.add_module("relu", nn.ReLU())
        return seq

    class CAMLayer(nn.Module):
        def __init__(self, bn_ch, out_ch, k, dilation, reduction=2):
            super().__init__()
            pad = (k - 1) // 2 * dilation
            self.linear_local = nn.Conv1d(bn_ch, out_ch, k, 1, pad, dilation,
                                          bias=False)
            self.linear1 = nn.Conv1d(bn_ch, bn_ch // reduction, 1)
            self.linear2 = nn.Conv1d(bn_ch // reduction, out_ch, 1)

        def seg_pooling(self, x, seg_len=100):
            seg = F.avg_pool1d(x, seg_len, seg_len, ceil_mode=True)
            shape = seg.shape
            seg = seg.unsqueeze(-1).expand(*shape, seg_len).reshape(*shape[:-1], -1)
            return seg[..., : x.shape[-1]]

        def forward(self, x):
            y = self.linear_local(x)
            context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
            context = F.relu(self.linear1(context))
            m = torch.sigmoid(self.linear2(context))
            return y * m

    class CAMDenseTDNNLayer(nn.Module):
        def __init__(self, in_ch, out_ch, bn_ch, k, dilation):
            super().__init__()
            self.nonlinear1 = nonlin(in_ch)
            self.linear1 = nn.Conv1d(in_ch, bn_ch, 1, bias=False)
            self.nonlinear2 = nonlin(bn_ch)
            self.cam_layer = CAMLayer(bn_ch, out_ch, k, dilation)

        def forward(self, x):
            x = self.linear1(self.nonlinear1(x))
            return self.cam_layer(self.nonlinear2(x))

    class CAMDenseTDNNBlock(nn.Module):
        def __init__(self, num_layers, in_ch, out_ch, bn_ch, k, dilation):
            super().__init__()
            for i in range(num_layers):
                self.add_module(
                    f"tdnnd{i + 1}",
                    CAMDenseTDNNLayer(in_ch + i * out_ch, out_ch, bn_ch, k, dilation),
                )

        def forward(self, x):
            for layer in self.children():
                x = torch.cat([x, layer(x)], dim=1)
            return x

    class TransitLayer(nn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.nonlinear = nonlin(in_ch)
            self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=False)

        def forward(self, x):
            return self.linear(self.nonlinear(x))

    class TDNNLayer(nn.Module):
        def __init__(self, in_ch, out_ch, k, stride, dilation=1):
            super().__init__()
            pad = (k - 1) // 2 * dilation
            self.linear = nn.Conv1d(in_ch, out_ch, k, stride, pad, dilation,
                                    bias=False)
            self.nonlinear = nonlin(out_ch)

        def forward(self, x):
            return self.nonlinear(self.linear(x))

    class StatsPool(nn.Module):
        def forward(self, x):  # [B, C, T]
            return torch.cat([x.mean(-1), x.std(-1, unbiased=True)], dim=-1)

    class DenseLayer(nn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.linear = nn.Conv1d(in_ch, out_ch, 1, bias=False)
            self.nonlinear = nn.Sequential()  # config_str='batchnorm_'
            self.nonlinear.add_module("batchnorm", nn.BatchNorm1d(out_ch, affine=False))

        def forward(self, x):
            x = self.linear(x.unsqueeze(-1)).squeeze(-1)
            return self.nonlinear(x)

    class CAMPPlus(nn.Module):
        def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                     bn_size=4, init_channels=128):
            super().__init__()
            from collections import OrderedDict

            self.head = FCM(feat_dim=feat_dim)
            channels = 32 * (feat_dim // 8)
            self.xvector = nn.Sequential(OrderedDict([
                ("tdnn", TDNNLayer(channels, init_channels, 5, 2)),
            ]))
            channels = init_channels
            for i, (num_layers, k, dilation) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2))
            ):
                self.xvector.add_module(
                    f"block{i + 1}",
                    CAMDenseTDNNBlock(num_layers, channels, growth_rate,
                                      bn_size * growth_rate, k, dilation),
                )
                channels += num_layers * growth_rate
                self.xvector.add_module(
                    f"transit{i + 1}", TransitLayer(channels, channels // 2)
                )
                channels //= 2
            self.xvector.add_module("out_nonlinear", nonlin(channels))
            self.xvector.add_module("stats", StatsPool())
            self.xvector.add_module(
                "dense", DenseLayer(channels * 2, embedding_size)
            )

        def forward(self, x):  # x [B, T, F]
            x = x.permute(0, 2, 1)
            x = self.head(x)
            return self.xvector(x)

    return CAMPPlus()



def _build_torch_pyannet(torch):
    """pyannote.audio's PyanNet (segmentation-3.0 topology), built here as an
    independent torch implementation for numeric parity tests."""
    import math

    import torch.nn as nn
    import torch.nn.functional as F

    class SincConv(nn.Module):
        """Classic SincNet filterbank (asteroid ParamSincFB semantics)."""

        def __init__(self, out_channels=80, kernel_size=251, stride=10,
                     sample_rate=16000, min_low_hz=50, min_band_hz=50):
            super().__init__()
            self.stride = stride
            self.sample_rate = sample_rate
            self.min_low_hz = min_low_hz
            self.min_band_hz = min_band_hz
            self.kernel_size = kernel_size
            low_hz, high_hz = 30.0, sample_rate / 2 - (min_low_hz + min_band_hz)
            mel = np.linspace(
                2595 * np.log10(1 + low_hz / 700),
                2595 * np.log10(1 + high_hz / 700),
                out_channels + 1,
            )
            hz = 700 * (10 ** (mel / 2595) - 1)
            self.low_hz_ = nn.Parameter(
                torch.tensor(hz[:-1], dtype=torch.float32).view(-1, 1)
            )
            self.band_hz_ = nn.Parameter(
                torch.tensor(np.diff(hz), dtype=torch.float32).view(-1, 1)
            )
            half = kernel_size // 2
            n_lin = torch.linspace(0, (kernel_size / 2) - 1, steps=half)
            self.register_buffer(
                "window_", 0.54 - 0.46 * torch.cos(2 * math.pi * n_lin / kernel_size)
            )
            n = (kernel_size - 1) / 2.0
            self.register_buffer(
                "n_", 2 * math.pi * torch.arange(-n, 0).view(1, -1) / sample_rate
            )

        def forward(self, x):
            low = self.min_low_hz + torch.abs(self.low_hz_)
            high = torch.clamp(
                low + self.min_band_hz + torch.abs(self.band_hz_),
                self.min_low_hz, self.sample_rate / 2,
            )
            band = (high - low)[:, 0]
            f_lo = torch.matmul(low, self.n_)
            f_hi = torch.matmul(high, self.n_)
            left = ((torch.sin(f_hi) - torch.sin(f_lo)) / (self.n_ / 2)) * self.window_
            center = 2 * band.view(-1, 1)
            right = torch.flip(left, dims=[1])
            filt = torch.cat([left, center, right], dim=1)
            filt = filt / (2 * band[:, None])
            return F.conv1d(x, filt.view(-1, 1, self.kernel_size),
                            stride=self.stride)

    class SincNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
            self.conv1d = nn.ModuleList([
                SincConv(),
                nn.Conv1d(80, 60, 5, stride=1),
                nn.Conv1d(60, 60, 5, stride=1),
            ])
            self.pool1d = nn.ModuleList([nn.MaxPool1d(3, 3) for _ in range(3)])
            self.norm1d = nn.ModuleList([
                nn.InstanceNorm1d(80, affine=True),
                nn.InstanceNorm1d(60, affine=True),
                nn.InstanceNorm1d(60, affine=True),
            ])

        def forward(self, waveforms):
            x = self.wav_norm1d(waveforms)
            for c, (conv, pool, norm) in enumerate(
                zip(self.conv1d, self.pool1d, self.norm1d)
            ):
                x = conv(x)
                if c == 0:
                    x = torch.abs(x)
                x = torch.nn.functional.leaky_relu(norm(pool(x)))
            return x

    class PyanNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.sincnet = SincNet()
            self.lstm = nn.LSTM(60, 128, num_layers=4, bidirectional=True,
                                batch_first=True)
            self.linear = nn.ModuleList(
                [nn.Linear(256, 128), nn.Linear(128, 128)]
            )
            self.classifier = nn.Linear(128, 7)

        def forward(self, waveforms):  # [B, 1, T]
            x = self.sincnet(waveforms)
            x = x.permute(0, 2, 1)
            x, _ = self.lstm(x)
            for lin in self.linear:
                x = torch.nn.functional.leaky_relu(lin(x))
            return torch.log_softmax(self.classifier(x), dim=-1)

    return PyanNet()




def dtw_anchor_times_torch(qk: np.ndarray, n_frames: int,
                           medfilt_width: int = 7,
                           sot_len: int = 0,
                           n_tok: int | None = None) -> np.ndarray:
    """Independent torch reference of the whole word-alignment pipeline:
    openai-whisper `timing.find_alignment` semantics (softmax over valid
    frames -> std_mean normalize over tokens -> median filter -> head
    average -> DTW over -matrix -> per-token first-entered frame), written
    against torch ops and a full-table O(N*M) DP with trace pointers —
    deliberately NOT sharing code with `ops/dtw.py` (host numpy reductions
    + associative-scan device DP). `tests/test_quality_fixture.py` computes
    the word-timestamp MAE between the two on identical attention — the
    offline stand-in for the <= 20 ms MAE target vs whisper.cpp's `t_dtw`
    (`/root/reference/src/transcribe.rs:273-306`, BASELINE.md).

    `qk` is [K, S, Ta]; softmax/standardize/medfilt run over ALL S rows
    given (openai normalizes over the full teacher-forced sequence), then
    the DTW runs on text rows [sot_len : sot_len + n_tok] (openai's
    `weights[:, len(sot_sequence):-1]` slice); pass sot_len=0/n_tok=None
    when qk is already text-rows-only."""
    import torch
    import torch.nn.functional as F

    w = torch.from_numpy(
        np.array(qk, np.float32))[:, :, : max(int(n_frames), 1)]
    w = torch.softmax(w, dim=-1)
    std, mean = torch.std_mean(w, dim=-2, keepdim=True, unbiased=False)
    w = (w - mean) / torch.clamp(std, min=1e-9)
    pad = medfilt_width // 2
    if w.shape[-1] > pad:
        wp = F.pad(w, (pad, pad), mode="reflect")
        w = wp.unfold(-1, medfilt_width, 1).median(dim=-1).values
    matrix = w.mean(dim=0).numpy()  # [S, T]
    if n_tok is not None:
        matrix = matrix[sot_len: sot_len + n_tok]
    x = -matrix

    # full-table DP with trace pointers (openai timing.dtw semantics:
    # argmin over (diag, up, left) — first index wins ties)
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, np.float64)
    trace = np.zeros((N + 1, M + 1), np.int8)
    cost[0, 0] = 0.0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            cands = (cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1])
            k = int(np.argmin(cands))
            cost[i, j] = x[i - 1, j - 1] + cands[k]
            trace[i, j] = k
    i, j = N, M
    ti, tj = [], []
    while i > 0 or j > 0:
        ti.append(i - 1)
        tj.append(j - 1)
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            k = trace[i, j]
            if k == 0:
                i -= 1
                j -= 1
            elif k == 1:
                i -= 1
            else:
                j -= 1
    text_idx = np.array(ti[::-1], np.int64)
    time_idx = np.array(tj[::-1], np.int64)

    anchors = np.zeros((N,), np.float64)
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    for r, t in zip(text_idx[jumps], time_idx[jumps] * 0.02):
        anchors[r] = t
    seen = set(text_idx[jumps].tolist())
    for k in range(1, N):
        if k not in seen:
            anchors[k] = max(anchors[k], anchors[k - 1])
    return anchors
