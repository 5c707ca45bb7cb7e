"""Exit-code contract of `evals/parity.py` (VERDICT r4 Next #8).

The real-checkpoint parity drill is structurally blocked offline (no
network), but its exit-code semantics must already be a gate, not an
interpretation exercise: 0 on pass/skip, 1 on any FAIL. These tests
exercise the contract with a synthetic-but-real-shaped CAM++ checkpoint
(the torch replica's own state_dict), so the first networked run of
`python evals/parity.py ...` can be wired straight into CI.
Tolerance table: docs/PARITY.md §Expected tolerances.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "evals"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def campplus_ckpt(tmp_path_factory):
    import torch
    from torch_refs import _build_torch_campplus

    net = _build_torch_campplus(torch)
    path = tmp_path_factory.mktemp("parity") / "campplus.pt"
    torch.save(net.state_dict(), str(path))
    return str(path)


def test_parity_pass_exits_zero(campplus_ckpt, capsys):
    import parity

    rc = parity.main(["campplus", campplus_ckpt])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS" in out


def test_parity_fail_exits_nonzero(campplus_ckpt, monkeypatch, capsys):
    import parity

    orig = parity._report
    monkeypatch.setattr(
        parity, "_report", lambda name, diff, tol: orig(name, diff, -1.0))
    rc = parity.main(["campplus", campplus_ckpt])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL" in out


def test_parity_missing_checkpoint_skips_zero(capsys):
    import parity

    rc = parity.main(["campplus", "/nonexistent/ckpt.pt"])
    assert rc == 0
    assert "SKIP" in capsys.readouterr().out
