"""Speculative greedy decoding must be output-identical to plain greedy.

The emitted tokens are always the TARGET's prepared-argmax choices, so the
draft quality only affects speed — never the result. Verified with the
strongest and weakest drafts: the target itself (near-100% acceptance) and
unrelated random models (near-0% acceptance), plus a different-architecture
draft and several gamma values.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_diarize_tpu.models import whisper as wm
from whisper_diarize_tpu.ops import decode as dec
from whisper_diarize_tpu.ops import speculative as spec
from whisper_diarize_tpu.tokenizer import DebugTokenizer

from tests.test_whisper_model import TINY_TEST_CFG

pytestmark = pytest.mark.slow  # full speculative decode loops (`pytest -m slow`)

DRAFT_CFG = wm.WhisperConfig(
    n_mels=80, n_vocab=51865,
    n_audio_ctx=1500, n_audio_state=32, n_audio_head=2, n_audio_layer=1,
    n_text_ctx=448, n_text_state=32, n_text_head=2, n_text_layer=1,
)


@pytest.fixture(scope="module")
def setup():
    params = wm.init_params(TINY_TEST_CFG, seed=3)
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 80, 3000)), jnp.float32
    )
    xa = wm.encode(params, mel, TINY_TEST_CFG)
    tk = DebugTokenizer()
    prompt = jnp.asarray(
        np.tile(np.array(tk.sot_sequence(task="transcribe", language="en"),
                         np.int32), (2, 1)))
    dc = dec.DecodeConfig(max_tokens=16, blank_id=32)
    ref = dec.greedy_decode(
        params, TINY_TEST_CFG, dc, tk.specials, xa, prompt, prompt.shape[1])
    return params, xa, tk, prompt, dc, mel, ref


def _assert_matches_greedy(res, ref):
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(res.lengths), np.asarray(ref.lengths))
    np.testing.assert_allclose(
        np.asarray(res.sum_logprob), np.asarray(ref.sum_logprob),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.token_probs), np.asarray(ref.token_probs),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(res.no_speech_prob), np.asarray(ref.no_speech_prob),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_self_draft_matches_greedy(setup, gamma):
    """Draft == target: near-total acceptance, identical output."""
    params, xa, tk, prompt, dc, mel, ref = setup
    res = spec.speculative_greedy_decode(
        params, TINY_TEST_CFG, params, TINY_TEST_CFG, dc, tk.specials,
        xa, xa, prompt, prompt.shape[1], gamma=gamma)
    _assert_matches_greedy(res, ref)


def test_unrelated_random_draft_matches_greedy(setup):
    """A draft that agrees with nothing: every round emits exactly one
    corrected token — output still identical."""
    params, xa, tk, prompt, dc, mel, ref = setup
    params_bad = wm.init_params(TINY_TEST_CFG, seed=99)
    xa_bad = wm.encode(params_bad, mel, TINY_TEST_CFG)
    res = spec.speculative_greedy_decode(
        params, TINY_TEST_CFG, params_bad, TINY_TEST_CFG, dc, tk.specials,
        xa, xa_bad, prompt, prompt.shape[1], gamma=3)
    _assert_matches_greedy(res, ref)


def test_smaller_architecture_draft_matches_greedy(setup):
    """Different (smaller) draft architecture, own encoder."""
    params, xa, tk, prompt, dc, mel, ref = setup
    params_d = wm.init_params(DRAFT_CFG, seed=7)
    xa_d = wm.encode(params_d, mel, DRAFT_CFG)
    res = spec.speculative_greedy_decode(
        params, TINY_TEST_CFG, params_d, DRAFT_CFG, dc, tk.specials,
        xa, xa_d, prompt, prompt.shape[1], gamma=4)
    _assert_matches_greedy(res, ref)


def test_round_count_reflects_acceptance(setup):
    """Self-draft needs ~max_tokens/gamma rounds; a hostile draft needs
    ~max_tokens rounds (one correction each)."""
    params, xa, tk, prompt, dc, mel, ref = setup
    sup = jnp.asarray(dec.build_suppress_mask(tk.specials, TINY_TEST_CFG.n_vocab))
    _, rounds_self = spec.speculative_greedy_run(
        params, TINY_TEST_CFG, params, TINY_TEST_CFG, dc, tk.specials,
        xa, xa, prompt, prompt.shape[1], sup, gamma=4)
    params_bad = wm.init_params(TINY_TEST_CFG, seed=99)
    xa_bad = wm.encode(params_bad, mel, TINY_TEST_CFG)
    _, rounds_bad = spec.speculative_greedy_run(
        params, TINY_TEST_CFG, params_bad, TINY_TEST_CFG, dc, tk.specials,
        xa, xa_bad, prompt, prompt.shape[1], sup, gamma=4)
    assert int(rounds_self) <= int(rounds_bad)
    max_len = int(np.asarray(ref.lengths).max())
    assert int(rounds_self) <= max(-(-max_len // 4) + 2, 3)


def test_sim_accept_round_structure(setup):
    """The bench-only `sim_accept` hook (controlled acceptance for timing,
    `tools/bench_speculative.py`) shapes the round count as designed:
    α=1.0 matches the self-draft ceiling (~max_tokens/gamma rounds), lower
    α needs more rounds, and every row still emits a full transcript."""
    params, xa, tk, prompt, dc, mel, ref = setup
    sup = jnp.asarray(
        dec.build_suppress_mask(tk.specials, TINY_TEST_CFG.n_vocab,
                                extra_suppress=[tk.specials.eot]))
    params_bad = wm.init_params(TINY_TEST_CFG, seed=99)
    xa_bad = wm.encode(params_bad, mel, TINY_TEST_CFG)
    rounds = {}
    for alpha in (1.0, 0.5):
        res, r = spec.speculative_greedy_run(
            params, TINY_TEST_CFG, params_bad, TINY_TEST_CFG, dc,
            tk.specials, xa, xa_bad, prompt, prompt.shape[1], sup,
            gamma=4, sim_accept=alpha)
        rounds[alpha] = int(r)
        assert (np.asarray(res.lengths) == dc.max_tokens).all()
    assert rounds[1.0] == -(-dc.max_tokens // 4)
    assert rounds[0.5] > rounds[1.0]


def test_temperature_rejected(setup):
    """speculative_greedy_run is argmax-only: a non-zero sampling
    temperature must be rejected loudly, not silently ignored (ADVICE r2)."""
    params, xa, tk, prompt, dc, mel, ref = setup
    import dataclasses

    dc_temp = dataclasses.replace(dc, temperature=0.7)
    with pytest.raises(ValueError, match="temperature"):
        spec.speculative_greedy_run(
            params, TINY_TEST_CFG, params, TINY_TEST_CFG, dc_temp,
            tk.specials, xa, xa, prompt, prompt.shape[1],
            jnp.asarray(dec.build_suppress_mask(
                tk.specials, TINY_TEST_CFG.n_vocab)))


def test_cancellation_polls_between_round_budgets(setup):
    """With is_cancelled set, the round loop re-enters in poll_rounds
    budget windows and a cancel stops it early (ADVICE r2: the fused
    while_loop used to run the whole window regardless)."""
    params, xa, tk, prompt, dc, mel, ref = setup
    sup = jnp.asarray(
        dec.build_suppress_mask(tk.specials, TINY_TEST_CFG.n_vocab,
                                extra_suppress=[tk.specials.eot]))
    params_bad = wm.init_params(TINY_TEST_CFG, seed=99)
    xa_bad = wm.encode(params_bad, mel, TINY_TEST_CFG)
    polls = []

    def cancel_after_first():
        polls.append(True)
        return len(polls) >= 1

    # hostile draft: ~1 token/round, so a poll_rounds=2 window emits ~2
    # tokens before the first poll; a full run would emit max_tokens
    res, rounds = spec.speculative_greedy_run(
        params, TINY_TEST_CFG, params_bad, TINY_TEST_CFG, dc, tk.specials,
        xa, xa_bad, prompt, prompt.shape[1], sup, gamma=3,
        is_cancelled=cancel_after_first, poll_rounds=2)
    assert polls, "is_cancelled was never polled"
    assert int(rounds) <= 2
    assert (np.asarray(res.lengths) < dc.max_tokens).all()
