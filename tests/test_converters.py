import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

sys.path.insert(0, "evals")

from torch_refs import (  # noqa: E402
    _build_torch_campplus,
    _build_torch_pyannet,
)
from convert_models import (  # noqa: E402
    convert_campplus,
    convert_pyannote,
    convert_silero,
)


def test_pyannote_torch_parity(tmp_path):
    """Independent torch PyanNet vs the JAX forward: converted random
    weights must produce the same log-probs (validates wav-InstanceNorm,
    sinc filter construction, pool/norm order, BiLSTM stacking)."""
    torch = pytest.importorskip("torch")

    from whisper_diarize_tpu.models import segmentation as seg

    torch.manual_seed(1)
    net = _build_torch_pyannet(torch).eval()
    with torch.no_grad():
        net.sincnet.wav_norm1d.weight.fill_(1.3)
        net.sincnet.wav_norm1d.bias.fill_(0.05)
        for norm in net.sincnet.norm1d:
            norm.weight.uniform_(0.7, 1.3)
            norm.bias.uniform_(-0.1, 0.1)

    src = tmp_path / "pyannet.bin"
    torch.save(net.state_dict(), src)
    dst = tmp_path / "seg.npz"
    convert_pyannote(str(src), str(dst))
    params = seg.load_params(str(dst))

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((1, 16000 * 2)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(audio).unsqueeze(1)).numpy()

    out = np.asarray(seg.forward(params, audio))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
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
