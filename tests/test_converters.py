import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from convert_models import convert_pyannote, convert_silero  # noqa: E402


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
