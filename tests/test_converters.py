import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from convert_models import (  # noqa: E402
    convert_campplus,
    convert_pyannote,
    convert_silero,
)


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


def test_campplus_conversion_and_torch_parity(tmp_path):
    """Build the REAL upstream CAM++ topology in torch, randomize it, convert
    its state dict, and require (a) zero missing / zero unmapped tensors and
    (b) the JAX forward matching the torch forward numerically (VERDICT r1
    item 2)."""
    torch = pytest.importorskip("torch")

    from whisper_diarize_tpu.models import campplus

    torch.manual_seed(0)
    net = _build_torch_campplus(torch).eval()
    # randomize BN running stats so eval-mode BN is a real transform
    with torch.no_grad():
        for mod in net.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.6, 1.4)
                if mod.affine:
                    mod.weight.uniform_(0.7, 1.3)
                    mod.bias.uniform_(-0.1, 0.1)

    src = tmp_path / "campplus.pt"
    torch.save(net.state_dict(), src)
    dst = tmp_path / "campplus.npz"
    missing, unmapped = convert_campplus(str(src), str(dst))
    assert missing == [], f"converter missing tensors: {missing[:5]}"
    assert unmapped == [], f"converter left tensors unmapped: {unmapped[:5]}"

    params = campplus.load_params(str(dst))
    rng = np.random.default_rng(0)
    T = 212
    feats = rng.standard_normal((1, T, 80)).astype(np.float32)

    with torch.no_grad():
        ref = net(torch.tensor(feats)).numpy()

    import jax.numpy as jnp

    out = np.asarray(campplus.embed_from_fbank(
        params, jnp.asarray(feats), jnp.ones((1, T), jnp.float32)
    ))
    assert out.shape == ref.shape == (1, 192)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_silero_conversion_roundtrip(tmp_path):
    """A synthetic torch state dict with Silero v5 names converts into a
    loadable silero_vad params file that drives the net."""
    torch = pytest.importorskip("torch")

    from whisper_diarize_tpu.models import silero_vad

    rng = np.random.default_rng(0)
    sd = {}
    chans = [(129, 128), (128, 64), (64, 64), (64, 128)]
    for i, (cin, cout) in enumerate(chans):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3)).astype(np.float32)
        )
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = torch.zeros(cout)
    H = 128
    sd["_model.decoder.rnn.weight_ih"] = torch.tensor(
        rng.standard_normal((4 * H, H)).astype(np.float32)
    )
    sd["_model.decoder.rnn.weight_hh"] = torch.tensor(
        rng.standard_normal((4 * H, H)).astype(np.float32)
    )
    sd["_model.decoder.rnn.bias_ih"] = torch.zeros(4 * H)
    sd["_model.decoder.rnn.bias_hh"] = torch.zeros(4 * H)
    sd["_model.decoder.decoder.2.weight"] = torch.tensor(
        rng.standard_normal((1, H, 1)).astype(np.float32)
    )
    sd["_model.decoder.decoder.2.bias"] = torch.zeros(1)

    src = tmp_path / "silero.pt"
    torch.save(sd, src)
    dst = tmp_path / "silero.npz"
    convert_silero(str(src), str(dst))

    params = silero_vad.load_params(str(dst))
    audio = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1
    probs = np.asarray(silero_vad.speech_probs(params, audio))
    assert probs.shape == (1, -(-16000 // silero_vad.CHUNK))
    assert ((probs >= 0) & (probs <= 1)).all()


def test_silero_torch_parity(tmp_path):
    """Independent torch implementation of the Silero-v5 op graph (the tensor
    set whisper.cpp's GGML converter maps) vs the JAX forward: same
    probabilities chunk by chunk, including the 64-sample context carry and
    LSTM state (VERDICT r1 item 2)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from whisper_diarize_tpu.models import silero_vad as sv

    rng = np.random.default_rng(3)
    sd = {}
    basis = rng.standard_normal((258, 1, 256)).astype(np.float32) * 0.1
    sd["_model.stft.forward_basis_buffer"] = torch.tensor(basis)
    chans = [(129, 128), (128, 64), (64, 64), (64, 128)]
    for i, (cin, cout) in enumerate(chans):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3)).astype(np.float32) * 0.1
        )
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1
        )
    H = 128
    for k in ("weight_ih", "weight_hh"):
        sd[f"_model.decoder.rnn.{k}"] = torch.tensor(
            rng.standard_normal((4 * H, H)).astype(np.float32) * 0.1
        )
    for k in ("bias_ih", "bias_hh"):
        sd[f"_model.decoder.rnn.{k}"] = torch.tensor(
            rng.standard_normal(4 * H).astype(np.float32) * 0.1
        )
    sd["_model.decoder.decoder.2.weight"] = torch.tensor(
        rng.standard_normal((1, H, 1)).astype(np.float32)
    )
    sd["_model.decoder.decoder.2.bias"] = torch.zeros(1)

    src = tmp_path / "silero.pt"
    torch.save(sd, src)
    dst = tmp_path / "silero.npz"
    convert_silero(str(src), str(dst))
    params = sv.load_params(str(dst))

    # torch reference, chunk loop with explicit context + LSTM state carry
    def torch_probs(audio):
        x = torch.tensor(audio)
        T = x.shape[-1]
        n_chunks = -(-T // sv.CHUNK)
        x = F.pad(x, (0, n_chunks * sv.CHUNK - T))
        ctx = torch.zeros(1, sv.CONTEXT)
        h = torch.zeros(1, H)
        c = torch.zeros(1, H)
        cell = torch.nn.LSTMCell(H, H)
        with torch.no_grad():
            cell.weight_ih.copy_(sd["_model.decoder.rnn.weight_ih"])
            cell.weight_hh.copy_(sd["_model.decoder.rnn.weight_hh"])
            cell.bias_ih.copy_(sd["_model.decoder.rnn.bias_ih"])
            cell.bias_hh.copy_(sd["_model.decoder.rnn.bias_hh"])
        strides = (1, 2, 2, 1)
        out = []
        with torch.no_grad():
            for i in range(n_chunks):
                chunk = x[:, i * sv.CHUNK : (i + 1) * sv.CHUNK]
                frame = torch.cat([ctx, chunk], dim=-1)  # [1, 576]
                padded = F.pad(frame.unsqueeze(1), (64, 0), mode="reflect")
                spec = F.conv1d(
                    padded, sd["_model.stft.forward_basis_buffer"], stride=128
                )  # [1, 258, 4]
                mag = torch.sqrt(
                    spec[:, :129] ** 2 + spec[:, 129:] ** 2 + 1e-12
                )
                e = mag
                for j, s in enumerate(strides):
                    e = F.conv1d(
                        e,
                        sd[f"_model.encoder.{j}.reparam_conv.weight"],
                        sd[f"_model.encoder.{j}.reparam_conv.bias"],
                        stride=s, padding=1,
                    )
                    e = F.relu(e)
                h, c = cell(e[:, :, 0], (h, c))
                p = torch.sigmoid(F.conv1d(
                    F.relu(h).unsqueeze(-1),
                    sd["_model.decoder.decoder.2.weight"],
                    sd["_model.decoder.decoder.2.bias"],
                ))[0, 0, 0]
                out.append(float(p))
                ctx = chunk[:, -sv.CONTEXT:]
        return np.array(out)

    import jax.numpy as jnp

    audio = (rng.standard_normal(sv.CHUNK * 5 + 100) * 0.3).astype(np.float32)
    ref = torch_probs(audio[None])
    ours = np.asarray(sv.speech_probs(params, jnp.asarray(audio[None])))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_pyannote_conversion_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")

    from whisper_diarize_tpu.models import segmentation as seg

    rng = np.random.default_rng(1)
    sd = {}
    sd["sincnet.conv1d.0.low_hz_"] = torch.tensor(
        np.linspace(30, 7000, seg.SINC_FILTERS).astype(np.float32).reshape(-1, 1)
    )
    sd["sincnet.conv1d.0.band_hz_"] = torch.tensor(
        np.full((seg.SINC_FILTERS, 1), 50.0, np.float32)
    )
    sd["sincnet.conv1d.1.weight"] = torch.tensor(
        rng.standard_normal((seg.CONV_FILTERS, seg.SINC_FILTERS, seg.CONV_KERNEL)).astype(np.float32)
    )
    sd["sincnet.conv1d.1.bias"] = torch.zeros(seg.CONV_FILTERS)
    sd["sincnet.conv1d.2.weight"] = torch.tensor(
        rng.standard_normal((seg.CONV_FILTERS, seg.CONV_FILTERS, seg.CONV_KERNEL)).astype(np.float32)
    )
    sd["sincnet.conv1d.2.bias"] = torch.zeros(seg.CONV_FILTERS)
    for i, n in ((0, seg.SINC_FILTERS), (1, seg.CONV_FILTERS), (2, seg.CONV_FILTERS)):
        sd[f"sincnet.norm1d.{i}.weight"] = torch.ones(n)
        sd[f"sincnet.norm1d.{i}.bias"] = torch.zeros(n)
    H = seg.LSTM_HIDDEN
    for i in range(seg.LSTM_LAYERS):
        n_in = seg.CONV_FILTERS if i == 0 else 2 * H
        for suffix in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{i}{suffix}"] = torch.tensor(
                rng.standard_normal((4 * H, n_in)).astype(np.float32)
            )
            sd[f"lstm.weight_hh_l{i}{suffix}"] = torch.tensor(
                rng.standard_normal((4 * H, H)).astype(np.float32)
            )
            sd[f"lstm.bias_ih_l{i}{suffix}"] = torch.zeros(4 * H)
            sd[f"lstm.bias_hh_l{i}{suffix}"] = torch.zeros(4 * H)
    sd["linear.0.weight"] = torch.tensor(
        rng.standard_normal((seg.LINEAR_DIM, 2 * H)).astype(np.float32)
    )
    sd["linear.0.bias"] = torch.zeros(seg.LINEAR_DIM)
    sd["linear.1.weight"] = torch.tensor(
        rng.standard_normal((seg.LINEAR_DIM, seg.LINEAR_DIM)).astype(np.float32)
    )
    sd["linear.1.bias"] = torch.zeros(seg.LINEAR_DIM)
    sd["classifier.weight"] = torch.tensor(
        rng.standard_normal((seg.N_CLASSES, seg.LINEAR_DIM)).astype(np.float32)
    )
    sd["classifier.bias"] = torch.zeros(seg.N_CLASSES)

    src = tmp_path / "pyannote.bin"
    torch.save(sd, src)
    dst = tmp_path / "seg.npz"
    convert_pyannote(str(src), str(dst))

    params = seg.load_params(str(dst))
    audio = rng.standard_normal((1, seg.WINDOW_SAMPLES)).astype(np.float32) * 0.1
    lp = np.asarray(seg.forward(params, audio))
    assert lp.shape == (1, seg.n_out_frames(seg.WINDOW_SAMPLES), 7)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, atol=1e-4)
