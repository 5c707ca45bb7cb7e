"""KV-cached Whisper decoding loops: greedy (with temperature/best-of) and
beam search — entirely on-device under `lax.while_loop`.

Replaces whisper.cpp's sampling loop (consumed by the reference through
`state.full`, `/root/reference/src/transcribe.rs:389`) and its strategy knobs
(`transcribe.rs:20-46`): BeamSearch{beam_size, patience} default with
best_of/beam_size default 5 clamped to >=1 (`transcribe.rs:22`), opt-in
greedy with temperature (`transcribe.rs:25-33,59-68`), `suppress_blank`
(`transcribe.rs:44`), token timestamps (`transcribe.rs:45`) and
single-segment decoding (`transcribe.rs:46`).

TPU-first design notes:
* Fixed shapes everywhere: the token buffer is [B, n_text_ctx], the KV cache
  [L, B, H, n_text_ctx, Dh]; a scalar step index walks them. No host<->device
  traffic inside the loop.
* Whisper's timestamp grammar (monotonic timestamps, pair rule, initial
  timestamp cap, timestamp-vs-text probability rule) is enforced with
  vectorized masks computed from O(1) loop-carried state per stream, not by
  re-scanning the token buffer.
* Beam search folds beams into the batch axis ([B*K]) so every step is one
  big MXU-friendly batch; cache reindexing after top-k is a gather on the
  batch axis.
* The whole loop runs per 30 s window over a batch of streams — the batch
  axis is the data-parallel axis that `parallel/mesh.py` shards over chips.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import whisper as wm
from ..tokenizer import SpecialTokens

NEG_INF = float("-inf")


def _resolve_pallas_split(dc: "DecodeConfig") -> bool:
    """Fused split-self-attention kernel for beam steps: explicit knob wins,
    else follow pallas_cross. WDT_DISABLE_PALLAS_SPLIT=1 opts out (row-level
    A/B lever — the round-5 isolated harness read the kernel SLOWER than
    the XLA ancestry-deref path at small Td, see tools/bench_beam_variants)."""
    import os

    if os.environ.get("WDT_DISABLE_PALLAS_SPLIT") == "1":
        return False
    return dc.pallas_cross if dc.pallas_split is None else dc.pallas_split


def _resolve_pallas_tail(dc: "DecodeConfig") -> bool:
    """Fused decoder-tail megakernel: explicit knob wins, else follow
    pallas_cross (it streams the same tiled cross cache — bf16 or the
    int8 variant, whose scales the kernel folds in VMEM); meshes fall
    back to the un-fused path. WDT_DISABLE_PALLAS_TAIL=1 opts out. The
    kernel only engages when a weight pack is attached to
    params["decoder"]["tail"] — TranscribeStep/bench.py attach it for
    GREEDY strategies only (the ~2 GB bf16 pack on top of the split beam
    cache exhausts v5e HBM at beam-5 b16; gate: tools/bench_megakernel.py)."""
    import os

    if os.environ.get("WDT_DISABLE_PALLAS_TAIL") == "1":
        return False
    if dc.mesh is not None:
        return False
    return dc.pallas_cross if dc.pallas_tail is None else dc.pallas_tail


def _resolve_unroll(dc: "DecodeConfig") -> bool:
    """Unrolled decoder layers for the sampling step: explicit knob wins,
    else on for the TPU backend only (CPU tests keep the cheap-to-compile
    scan; numerics are identical)."""
    if dc.unroll_layers is not None:
        return dc.unroll_layers
    return jax.default_backend() == "tpu"


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Static decode configuration (hashable: used as a jit static arg)."""

    beam_size: int = 5  # beams for beam search / best_of for sampling
    temperature: float = 0.0
    max_tokens: int = 224  # max sampled tokens per window (<= 448 - prompt)
    suppress_blank: bool = True  # `transcribe.rs:44`
    with_timestamps: bool = True
    max_initial_timestamp: float = 1.0  # seconds; openai-whisper default
    patience: float = 1.0  # beam search patience (whisper.cpp -1 => default 1.0)
    length_penalty: Optional[float] = None  # None => avg logprob ranking
    blank_id: int = 220  # " " token ("Ġ" in the BPE vocab; 32 for DebugTokenizer)
    quantize_cross_kv: bool = False  # int8 cross-KV cache (halves decode HBM traffic)
    # Pallas flash cross-attention for the decode loop (~1.7x on the decode
    # bottleneck, `ops/pallas_attn.py`); auto-enabled on TPU by the Engine
    pallas_cross: bool = False
    # Fused split-self-attention kernel for BEAM sampling steps (ancestry
    # one-hot resolved in VMEM; streams the decode cache once instead of
    # the XLA deref path's 3x, `ops/pallas_attn.py::split_self_attn_layer`).
    # None = follow pallas_cross.
    pallas_split: Optional[bool] = None
    # Fused decoder-tail megakernel for sampling steps (o-proj + ln2 +
    # cross-q + flash cross-attention + co-proj + ln3 + MLP in one Pallas
    # call, `ops/pallas_tail.py`). None = follow pallas_cross; engaged by
    # TranscribeStep attaching a packed weight bundle to the params.
    pallas_tail: Optional[bool] = None
    # Stream the tail megakernel's weight pack as int8 (per-tile-column
    # scales folded in VMEM): halves the pack's HBM residency and the
    # per-step weight stream. Quality knob, like quantize_cross_kv — the
    # TPU-native counterpart of running a quantized GGML checkpoint
    # (whisper.cpp's q8_0 decode). Only meaningful where pallas_tail
    # engages.
    quantize_tail_weights: bool = False
    # Unroll the decoder layer loop in the SAMPLING step (None = auto: on
    # for TPU). The lax.scan over stacked layers re-materializes every
    # layer's weights each step (~+1.7 GB/step HBM on large-v3; 13.1 ->
    # 10.5 ms/step unrolled). Prefill keeps the scan: it runs once per
    # window and unrolling would multiply compile time across the prompt
    # padding buckets.
    unroll_layers: Optional[bool] = None
    # Multi-chip inference mesh (jax.sharding.Mesh, hashable): when set,
    # the Pallas cross-attention wraps in shard_map over (data, model) so
    # the kernel runs per shard instead of forcing the XLA fallback
    # (VERDICT r2 Missing #3). None on the single-device path.
    mesh: Optional[Any] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeResult:
    """Per-stream decode output (device arrays; fixed shapes)."""

    tokens: jnp.ndarray  # [B, max_tokens] int32, eot-padded
    lengths: jnp.ndarray  # [B] int32, number of valid tokens (pre-eot)
    sum_logprob: jnp.ndarray  # [B] f32
    avg_logprob: jnp.ndarray  # [B] f32 (includes the eot step, like whisper)
    token_probs: jnp.ndarray  # [B, max_tokens] f32 — per-token softmax prob
    no_speech_prob: jnp.ndarray  # [B] f32 — P(<|nospeech|>) at the sot step


def build_suppress_mask(
    sp: SpecialTokens, n_vocab: int, extra_suppress: Optional[List[int]] = None
) -> np.ndarray:
    """Static additive mask [V]: -inf at always-suppressed tokens.

    Mirrors whisper's special-token suppression: task/lang/sot/prev/lm/
    nospeech/notimestamps tokens are never sampled.
    """
    mask = np.zeros((n_vocab,), np.float32)
    always = [sp.sot, sp.sot_lm, sp.sot_prev, sp.no_speech, sp.no_timestamps,
              sp.translate, sp.transcribe]
    always += [sp.sot + 1 + i for i in range(sp.num_languages)]
    for t in always:
        if t < n_vocab:
            mask[t] = NEG_INF
    for t in extra_suppress or []:
        if t < n_vocab:
            mask[t] = NEG_INF
    return mask


def _timestamp_rule_mask(
    logits: jnp.ndarray,  # [N, V] f32
    sp: SpecialTokens,
    step: jnp.ndarray,  # scalar: sampled-token index (0 = first sample)
    last_was_ts: jnp.ndarray,  # [N] bool
    penult_was_ts: jnp.ndarray,  # [N] bool
    max_ts_tok: jnp.ndarray,  # [N] int32 — highest timestamp token sampled
    ts_seen: jnp.ndarray,  # [N] bool — any timestamp sampled yet
    max_initial_ts_idx: int,
    extra_first_ban: Optional[jnp.ndarray] = None,  # [V] bool, step-0 bans
) -> jnp.ndarray:
    """Apply whisper's timestamp grammar, returning masked logits.

    All grammar bans fuse into ONE [N, V] boolean pass (the sampling loop
    runs this every token; four separate mask-adds measured ~2x the cost):
    * pair rule: after <ts> <ts> force text; after a lone <ts> force <ts>/eot
    * monotonicity: the next timestamp may not precede the largest sampled
      one (equality allowed only when completing a pair)
    * first sampled token must be a timestamp within max_initial_timestamp
      (openai-whisper masks everything below timestamp_begin here, EOT
      included)
    then the probability rule: if sum P(timestamps) > max P(text), only
    timestamps survive (ApplyTimestampRules masks ALL ids below
    timestamp_begin, EOT included).
    """
    V = logits.shape[-1]
    ids = jnp.arange(V)
    is_ts = ids >= sp.timestamp_begin

    force_text = last_was_ts & penult_was_ts
    force_ts = last_was_ts & (~penult_was_ts)
    strict = ~(last_was_ts & ~penult_was_ts)
    min_allowed = jnp.where(
        ts_seen, max_ts_tok + strict.astype(jnp.int32), sp.timestamp_begin
    )
    init_cap = sp.timestamp_begin + max_initial_ts_idx
    # `step` may be scalar (one loop position for all rows) or [N]
    # (speculative rounds: rows sit at different sampled indices)
    first = jnp.broadcast_to(
        jnp.asarray(step) == 0, logits.shape[:1])  # [N]

    banned = force_text[:, None] & is_ts[None, :]
    banned = banned | (force_ts[:, None] & (ids < sp.eot)[None, :])
    banned = banned | (is_ts[None, :] & (ids[None, :] < min_allowed[:, None]))
    first_ban = (~is_ts) | (ids > init_cap)
    if extra_first_ban is not None:
        first_ban = first_ban | extra_first_ban
    banned = banned | (first[:, None] & first_ban[None, :])
    logits = jnp.where(banned, NEG_INF, logits)

    # probability rule without materializing log_softmax: both sides of
    # whisper's `logsumexp(ts logprobs) > max(text logprobs)` subtract the
    # same row normalizer, so the comparison holds on raw masked logits —
    # the ts side reduces over only the [*, V - timestamp_begin] slice and
    # the [N, V] logprobs buffer (write + two reduction reads per sampled
    # token) disappears (bench_beam_breakdown `sample`: the selection chain
    # was ~1.0 ms/step on large-v3 b16, dominated by these passes)
    ts_lse = jax.nn.logsumexp(logits[:, sp.timestamp_begin:], axis=-1)
    max_text = jnp.max(logits[:, : sp.timestamp_begin], axis=-1)
    force = ts_lse > max_text
    logits = jnp.where(force[:, None] & (~is_ts[None, :]), NEG_INF, logits)
    return logits


def _prepare_logits(
    raw_logits: jnp.ndarray,  # [N, V]
    suppress_mask: jnp.ndarray,  # [V]
    sp: SpecialTokens,
    dc: DecodeConfig,
    step: jnp.ndarray,
    last_was_ts, penult_was_ts, max_ts_tok, ts_seen,
) -> jnp.ndarray:
    logits = raw_logits + suppress_mask[None, :]
    V = logits.shape[-1]
    ids = jnp.arange(V)
    # step-0 blank suppression (" " and eot, `transcribe.rs:44`) folds into
    # the grammar's fused first-token ban
    blank_ban = (
        (ids == dc.blank_id) | (ids == sp.eot) if dc.suppress_blank else None
    )
    if dc.with_timestamps:
        logits = _timestamp_rule_mask(
            logits, sp, step, last_was_ts, penult_was_ts, max_ts_tok, ts_seen,
            int(round(dc.max_initial_timestamp / 0.02)),
            extra_first_ban=blank_ban,
        )
    else:
        banned = jnp.broadcast_to(
            (ids >= sp.timestamp_begin)[None, :],
            (raw_logits.shape[0], V)).copy()
        if blank_ban is not None:
            first = jnp.broadcast_to(
                jnp.asarray(step) == 0, raw_logits.shape[:1])
            banned = banned | (first[:, None] & blank_ban[None, :])
        logits = jnp.where(banned, NEG_INF, logits)
    return logits


def build_cross_cache(
    params: Dict[str, Any], cfg: wm.WhisperConfig, dc: DecodeConfig,
    xa: jnp.ndarray,
) -> Dict[str, Any]:
    """Cross-K/V cache in the layout the DecodeConfig selects.

    pallas_cross -> the flash kernel's pre-tiled layout, computed straight
    into it by `cross_kv_tiled` (skips the ~8 GB transpose of
    tile_cross_cache, 108 -> 66 ms on large-v3 b16); quantize_cross_kv
    stacks int8 on either layout (in-kernel dequant with the kernel,
    memory-capacity-only without).
    """
    if dc.pallas_cross and dc.quantize_cross_kv:
        # int8 payloads dequantized INSIDE the flash kernel (~55% of the
        # bf16 stream); without the kernel, int8 stays a memory-only option.
        # Build tiled-first (the probe-gated build kernel) and quantize in
        # the tiled layout — the plain-layout detour cost ~135 ms extra
        # prefill on large-v3 b16.
        return wm.quantize_tiled_cross_cache(
            wm.cross_kv_tiled(params, xa, cfg, mesh=dc.mesh))
    if dc.quantize_cross_kv:
        return wm.quantize_cross_kv(wm.cross_kv(params, xa, cfg))
    if dc.pallas_cross:
        return wm.cross_kv_tiled(params, xa, cfg, mesh=dc.mesh)
    return wm.cross_kv(params, xa, cfg)


@functools.partial(
    jax.jit, static_argnames=("cfg", "dc", "sp", "prompt_len", "sot_pos")
)
def greedy_init(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,  # [B, Ta, D] encoded audio
    prompt: jnp.ndarray,  # [B, P] int32 (sot sequence, possibly with prev-text)
    prompt_len: int,
    rng: Optional[jnp.ndarray] = None,  # PRNG key when temperature > 0
    suppress_mask: Optional[jnp.ndarray] = None,  # [V]
    sot_pos: int = 0,  # index of <|startoftranscript|> within the prompt
    row_pad: Optional[jnp.ndarray] = None,  # [B] per-row prompt left-pad
) -> Dict[str, Any]:
    """Prefill the prompt and build the greedy loop state (device pytree).

    The state carries everything the sampling loop needs (cross cache, KV
    cache, token buffers, grammar flags), so `greedy_run` can be re-entered
    with an increasing token budget — the engine polls `is_cancelled`
    between budget windows (the reference aborts whisper.cpp mid-inference
    through its abort callback, `transcribe.rs:348-350`).

    `row_pad` carries per-row prompt lengths (rows left-padded to the common
    bucket P): each stream keeps its own rolling prompt inside one full
    batch (`transcribe.rs:384-386` semantics at TPU batch sizes)."""
    B = xa.shape[0]
    V = cfg.n_vocab
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)

    if suppress_mask is None:
        suppress_mask = jnp.asarray(build_suppress_mask(sp, V))
    if row_pad is None:
        row_pad = jnp.zeros((B,), jnp.int32)

    cross_cache = build_cross_cache(params, cfg, dc, xa)
    # size the KV cache to the decode budget, 16-aligned (bf16 sublane
    # tile): every step streams the whole cache, so padding slots are pure
    # HBM waste (64-alignment wasted up to ~2x at short prompts)
    cache_len = min(cfg.n_text_ctx, -(-(prompt_len + max_steps + 1) // 16) * 16)
    cache = wm.init_self_cache(cfg, B, xa.dtype, cache_len)

    # prefill the prompt; only the sot + last positions are projected to
    # the vocabulary (logits_at skips the [B, P, V] buffer at long prompts)
    P = prompt.shape[1]
    pos_at = (sot_pos,) if sot_pos == P - 1 else (sot_pos, P - 1)
    # prompt pass stays on the lax.scan driver: unrolling LOSES here (A/B
    # on v5e large-v3 b16, tools/bench_prefill_ab.py: scan 68.7/74.7 ms vs
    # unroll 70.2/78.0 at P=3/48) — the scan's per-layer weight slices
    # amortize over P tokens of work, unlike the S=1 sampling step
    logits_all, cache = wm.decode_step(
        params, cfg, prompt, jnp.int32(0), cache, cross_cache,
        row_pad=row_pad, mesh=dc.mesh, logits_at=pos_at,
    )
    first_logits = logits_all[:, -1]  # [B, V]
    # no-speech prob is read from the logits produced right after consuming
    # <|startoftranscript|>
    sot_logits = logits_all[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, sp.no_speech]

    return dict(
        step=jnp.int32(0),
        logits=first_logits,
        cache=cache,
        cross=cross_cache,
        tokens=jnp.full((B, max_steps), sp.eot, jnp.int32),
        probs=jnp.zeros((B, max_steps), jnp.float32),
        sum_logprob=jnp.zeros((B,), jnp.float32),
        length=jnp.zeros((B,), jnp.int32),
        finished=jnp.zeros((B,), bool),
        last_was_ts=jnp.zeros((B,), bool),
        penult_was_ts=jnp.zeros((B,), bool),
        max_ts_tok=jnp.full((B,), sp.timestamp_begin, jnp.int32),
        ts_seen=jnp.zeros((B,), bool),
        rng=rng if rng is not None else jax.random.PRNGKey(0),
        no_speech_prob=no_speech_prob,
        row_pad=row_pad,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "dc", "sp", "prompt_len"),
    donate_argnames=("state",),
)
def greedy_run(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    state: Dict[str, Any],
    suppress_mask: jnp.ndarray,
    prompt_len: int,
    budget: jnp.ndarray,  # scalar int32: stop once step reaches this
) -> Dict[str, Any]:
    """Advance the greedy sampling loop up to `budget` total steps.

    `state` is DONATED: callers must chain (`state = greedy_run(.., state, ..)`)
    and never touch the old pytree again. Without donation XLA copies the
    tiled cross cache at entry (no input/output aliasing) — 2 x 3.9 GB
    (~11 ms) per call on large-v3 b16.
    """
    sp_ts_begin = sp.timestamp_begin
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)
    cross_cache = state["cross"]

    def cond(s):
        return (
            (s["step"] < max_steps)
            & (s["step"] < budget)
            & (~jnp.all(s["finished"]))
        )

    def body(s):
        logits = _prepare_logits(
            s["logits"], suppress_mask, sp, dc, s["step"],
            s["last_was_ts"], s["penult_was_ts"], s["max_ts_tok"], s["ts_seen"],
        )
        # token logprob via the row normalizer — materializing the full
        # [N, V] log_softmax just to read one column costs two extra
        # full-vocab passes per step
        lse = jax.nn.logsumexp(logits, axis=-1)
        if dc.temperature > 0:
            key, sub = jax.random.split(s["rng"])
            next_tok = jax.random.categorical(
                sub, logits / dc.temperature, axis=-1
            ).astype(jnp.int32)
        else:
            key = s["rng"]
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        tok_logprob = jnp.take_along_axis(
            logits, next_tok[:, None], axis=-1
        )[:, 0] - lse
        tok_prob = jnp.exp(tok_logprob)

        was_finished = s["finished"]
        next_tok = jnp.where(was_finished, sp.eot, next_tok)
        now_finished = was_finished | (next_tok == sp.eot)

        tokens = s["tokens"].at[:, s["step"]].set(next_tok)
        probs = s["probs"].at[:, s["step"]].set(
            jnp.where(was_finished, 0.0, tok_prob)
        )
        # whisper adds the eot step's logprob once
        sum_logprob = s["sum_logprob"] + jnp.where(was_finished, 0.0, tok_logprob)
        length = s["length"] + jnp.where(now_finished, 0, 1)

        is_ts = next_tok >= sp_ts_begin
        new_state = dict(
            step=s["step"] + 1,
            cache=s["cache"],
            cross=s["cross"],
            tokens=tokens,
            probs=probs,
            sum_logprob=sum_logprob,
            length=length,
            finished=now_finished,
            last_was_ts=jnp.where(was_finished, s["last_was_ts"], is_ts),
            penult_was_ts=jnp.where(was_finished, s["penult_was_ts"], s["last_was_ts"]),
            max_ts_tok=jnp.where(
                is_ts & ~was_finished,
                jnp.maximum(s["max_ts_tok"], next_tok),
                s["max_ts_tok"],
            ),
            ts_seen=s["ts_seen"] | (is_ts & ~was_finished),
            rng=key,
            no_speech_prob=s["no_speech_prob"],
            row_pad=s["row_pad"],
        )
        step_logits, new_cache = wm.decode_step(
            params, cfg, next_tok[:, None],
            prompt_len + s["step"], s["cache"], cross_cache,
            row_pad=s["row_pad"], unroll=_resolve_unroll(dc), mesh=dc.mesh,
        )
        new_state["cache"] = new_cache
        new_state["logits"] = step_logits[:, 0]
        return new_state

    return jax.lax.while_loop(cond, body, state)


def greedy_finalize(state: Dict[str, Any]) -> DecodeResult:
    length = state["length"]
    # avg logprob normalizes by length + 1 (the eot), matching openai-whisper
    avg = state["sum_logprob"] / jnp.maximum(length + 1, 1).astype(jnp.float32)
    return DecodeResult(
        tokens=state["tokens"],
        lengths=length,
        sum_logprob=state["sum_logprob"],
        avg_logprob=avg,
        token_probs=state["probs"],
        no_speech_prob=state["no_speech_prob"],
    )


def greedy_decode(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,  # [B, Ta, D] encoded audio
    prompt: jnp.ndarray,  # [B, P] int32 (sot sequence, possibly with prev-text)
    prompt_len: int,
    rng: Optional[jnp.ndarray] = None,  # PRNG key when temperature > 0
    suppress_mask: Optional[jnp.ndarray] = None,  # [V]
    sot_pos: int = 0,  # index of <|startoftranscript|> within the prompt
    is_cancelled=None,  # host callback polled every poll_tokens steps
    poll_tokens: int = 32,
    row_pad: Optional[jnp.ndarray] = None,  # [B] per-row prompt left-pad
) -> DecodeResult:
    """Greedy / temperature sampling with a KV cache under lax.while_loop.

    With `is_cancelled` set, the loop runs in `poll_tokens`-step windows and
    the callback is polled between windows (one tiny host fetch each) — a
    cancel lands within ~poll_tokens decode steps instead of waiting out the
    whole window (the reference wires `is_cancelled` into whisper.cpp's
    abort callback, `transcribe.rs:348-350`).
    """
    if suppress_mask is None:
        suppress_mask = jnp.asarray(build_suppress_mask(sp, cfg.n_vocab))
    state = greedy_init(
        params, cfg, dc, sp, xa, prompt, prompt_len, rng=rng,
        suppress_mask=suppress_mask, sot_pos=sot_pos, row_pad=row_pad,
    )
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)
    if is_cancelled is None:
        state = greedy_run(
            params, cfg, dc, sp, state, suppress_mask, prompt_len,
            jnp.int32(max_steps),
        )
    else:
        budget = 0
        while budget < max_steps:
            budget = min(budget + max(poll_tokens, 1), max_steps)
            state = greedy_run(
                params, cfg, dc, sp, state, suppress_mask, prompt_len,
                jnp.int32(budget),
            )
            if bool(np.asarray(state["finished"]).all()) or is_cancelled():
                break
    return greedy_finalize(state)


def _retire_eot_candidates(
    sp: SpecialTokens,
    K: int,
    topv: jnp.ndarray,  # [B, 2K] candidate scores, sorted descending
    tok_idx: jnp.ndarray,  # [B, 2K] candidate token ids
    src_flat: jnp.ndarray,  # [B, 2K] flat source-beam row per candidate
    tokens: jnp.ndarray,  # [N, T] active-beam token buffers
    probs: jnp.ndarray,  # [N, T]
    length: jnp.ndarray,  # [N]
    fin_tokens, fin_probs, fin_scores, fin_lengths, fin_count,
):
    """Retire this step's EOT candidates into the finished slots, vectorized.

    Candidates arrive score-sorted from top_k, which is exactly the order a
    sequential best-remaining-argmax retiral would pick them in: the j-th
    finite EOT candidate goes to slot fin_count + j; overflow beyond the K
    slots is dropped (whisper keeps at most beam_size finished hypotheses).
    One scatter via per-slot candidate indices replaces the former K
    sequential argmax iterations (~K x 8 small kernels per decode step).
    Equivalence with the sequential semantics:
    `tests/test_decode.py::test_retire_eot_matches_sequential`.
    """
    B = topv.shape[0]
    retirable = (tok_idx == sp.eot) & jnp.isfinite(topv)  # [B, 2K]
    rank = jnp.cumsum(retirable.astype(jnp.int32), axis=1) - 1
    write_pos = fin_count[:, None] + rank  # [B, 2K] target slot
    valid = retirable & (write_pos < K)
    # slot k's candidate: W[b, c, k] has at most one True along c
    W = valid[:, :, None] & (
        write_pos[:, :, None] == jnp.arange(K)[None, None, :]
    )  # [B, 2K, K]
    taken = jnp.any(W, axis=1)  # [B, K]
    cidx = jnp.argmax(W, axis=1)  # [B, K] candidate index per slot
    bsrc = jnp.take_along_axis(src_flat, cidx, 1)  # [B, K] source row
    fin_tokens = jnp.where(taken[:, :, None], tokens[bsrc], fin_tokens)
    fin_probs = jnp.where(taken[:, :, None], probs[bsrc], fin_probs)
    fin_scores = jnp.where(
        taken, jnp.take_along_axis(topv, cidx, 1), fin_scores)
    fin_lengths = jnp.where(taken, length[bsrc], fin_lengths)
    fin_count = fin_count + jnp.sum(valid, axis=1)
    return fin_tokens, fin_probs, fin_scores, fin_lengths, fin_count


@functools.partial(
    jax.jit, static_argnames=("cfg", "dc", "sp", "prompt_len", "sot_pos")
)
def beam_init(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,  # [B, Ta, D]
    prompt: jnp.ndarray,  # [B, P]
    prompt_len: int,
    suppress_mask: Optional[jnp.ndarray] = None,
    sot_pos: int = 0,
    row_pad: Optional[jnp.ndarray] = None,  # [B]
) -> Dict[str, Any]:
    """Prefill the prompt and build the beam-search loop state."""
    B = xa.shape[0]
    K = dc.beam_size
    V = cfg.n_vocab
    N = B * K
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)

    if suppress_mask is None:
        suppress_mask = jnp.asarray(build_suppress_mask(sp, V))
    if row_pad is None:
        row_pad = jnp.zeros((B,), jnp.int32)

    # replicate streams K times: [B, ...] -> [B*K, ...]
    def rep(x):
        return jnp.repeat(x, K, axis=0)

    # cross K/V computed ONCE per stream (B rows) and shared across the K
    # beams inside decode_step — 1/K of the replicated-cache HBM traffic
    # cross layout mirrors greedy_init: the flash kernel folds a stream's
    # beams into its query axis, so beams share the tiled stream too (the
    # round-2 "beams gain nothing" note predated the corrected kernel
    # bandwidth measurement — the kernel streams at ~740 GB/s vs the beam
    # einsum's ~400)
    cross_cache = build_cross_cache(params, cfg, dc, xa)
    # SPLIT self-cache: the prompt half is prefillled ONCE PER STREAM (B
    # rows, 1/K of the old replicated prefill) and shared across its beams
    # forever — only the compact decode half [L, N, H, Td, Dh] is ever
    # gathered to surviving beams (the fused-cache gather was ~10 ms/step
    # on large-v3 b16, the dominant beam overhead)
    prompt_cache = wm.init_self_cache(cfg, B, xa.dtype, prompt_len)
    row_pad_n = rep(row_pad)
    P = prompt.shape[1]
    pos_at = (sot_pos,) if sot_pos == P - 1 else (sot_pos, P - 1)
    # scan driver on purpose — see the greedy_init prompt-pass note
    logits_all, prompt_cache = wm.decode_step(
        params, cfg, prompt, jnp.int32(0), prompt_cache, cross_cache,
        row_pad=row_pad, mesh=dc.mesh, logits_at=pos_at,
    )
    td = min(cfg.n_text_ctx, -(-max_steps // 16) * 16)
    decode_cache = wm.init_split_decode_cache(cfg, N, xa.dtype, td)
    first_logits = rep(logits_all[:, -1])
    sot_logits = logits_all[:, 0]
    no_speech_prob = jax.nn.softmax(sot_logits, axis=-1)[:, sp.no_speech]

    return dict(
        step=jnp.int32(0),
        logits=first_logits,  # [N, V]
        cache={"pk": prompt_cache["k"], "pv": prompt_cache["v"],
               "dk": decode_cache["k"], "dv": decode_cache["v"]},
        # ancestry row indices: anc[n, t] = physical row holding beam n's
        # slot-t K/V. The decode cache is NEVER permuted in the loop; the
        # indirection resolves at read time inside decode_step_split
        anc=jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                             (N, td)).copy(),
        cross=cross_cache,
        no_speech_prob=no_speech_prob,
        tokens=jnp.full((N, max_steps), sp.eot, jnp.int32),
        probs=jnp.zeros((N, max_steps), jnp.float32),
        # beam 0 starts at 0, the rest at -inf so the first expansion
        # doesn't produce K duplicates
        scores=jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)])[None, :],
            (B, 1),
        ).reshape(N),
        length=jnp.zeros((N,), jnp.int32),
        last_was_ts=jnp.zeros((N,), bool),
        penult_was_ts=jnp.zeros((N,), bool),
        max_ts_tok=jnp.full((N,), sp.timestamp_begin, jnp.int32),
        ts_seen=jnp.zeros((N,), bool),
        # finished slots per stream
        fin_tokens=jnp.full((B, K, max_steps), sp.eot, jnp.int32),
        fin_probs=jnp.zeros((B, K, max_steps), jnp.float32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_lengths=jnp.zeros((B, K), jnp.int32),
        fin_count=jnp.zeros((B,), jnp.int32),
        # per-row prompt pads: constant per stream, identical across its
        # beams, so beam reindexing never needs to gather it
        row_pad=row_pad_n,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "dc", "sp", "prompt_len"),
    donate_argnames=("state",),
)
def beam_run(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    state: Dict[str, Any],
    suppress_mask: jnp.ndarray,
    prompt_len: int,
    budget: jnp.ndarray,  # scalar int32
) -> Dict[str, Any]:
    """Advance the beam-search loop up to `budget` total steps.

    `state` is DONATED (chain calls, never reuse the old pytree) — see
    `greedy_run`: avoids entry copies of the shared cross cache.
    """
    B, K, _ = state["fin_tokens"].shape
    V = cfg.n_vocab
    N = B * K
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)
    cross_cache = state["cross"]

    n_fin_target = int(np.ceil(K * dc.patience)) if dc.patience > 0 else K
    n_fin_target = min(n_fin_target, K)

    def cond(s):
        return (
            (s["step"] < max_steps)
            & (s["step"] < budget)
            & ~jnp.all(s["fin_count"] >= n_fin_target)
        )

    def body(s):
        logits = _prepare_logits(
            s["logits"], suppress_mask, sp, dc, s["step"],
            s["last_was_ts"], s["penult_was_ts"], s["max_ts_tok"], s["ts_seen"],
        )
        # 2K expansion so EOT candidates can retire without starving beams.
        # EXACT two-stage selection: per-beam top-2K over V, then top-2K over
        # the pooled K*2K — any global top-2K candidate is inside its own
        # beam's top-2K, and this runs ~5x faster than lax.top_k on the fused
        # [B, K*V] row (0.9 vs 4.4 ms/step on large-v3 b16, v5e). The
        # per-row candidate ORDER equals the raw-logits order (the beam
        # score and softmax normalizer are constant within a row), so the
        # top-k runs on the logits and only the 2K selected values get the
        # score/normalizer adjustment — no [N, V] logprob materialization.
        # Tie-breaking caveat: candidates tied EXACTLY at the 2K boundary
        # may resolve differently than a fused lax.top_k over [B, K*V]
        # (selection happens per beam first); float ties at that boundary
        # are measure-zero with real logits and both resolutions are valid
        # beam sets (ADVICE r2).
        lse = jax.nn.logsumexp(logits, axis=-1)  # [N]
        v1, i1 = jax.lax.top_k(logits, 2 * K)  # [N, 2K] per-beam
        v1 = v1 - lse[:, None] + s["scores"][:, None]
        v1 = v1.reshape(B, K * 2 * K)
        i1 = (i1 + (jnp.arange(N) % K)[:, None] * V).reshape(B, K * 2 * K)
        topv, sel = jax.lax.top_k(v1, 2 * K)  # [B, 2K] pooled
        topi = jnp.take_along_axis(i1, sel, 1)  # flat K*V candidate index
        beam_idx = topi // V  # [B, 2K] source beam
        tok_idx = (topi % V).astype(jnp.int32)

        src_flat = (jnp.arange(B)[:, None] * K + beam_idx).astype(jnp.int32)  # [B, 2K]
        (fin_tokens, fin_probs, fin_scores, fin_lengths, fin_count) = (
            _retire_eot_candidates(
                sp, K, topv, tok_idx, src_flat,
                s["tokens"], s["probs"], s["length"],
                s["fin_tokens"], s["fin_probs"], s["fin_scores"],
                s["fin_lengths"], s["fin_count"],
            )
        )

        # --- keep top-K non-EOT candidates as the new active beams
        active_score = jnp.where(tok_idx == sp.eot, NEG_INF, topv)
        keepv, keepi = jax.lax.top_k(active_score, K)  # [B, K]
        new_tok = jnp.take_along_axis(tok_idx, keepi, 1).reshape(N)
        new_src = jnp.take_along_axis(src_flat, keepi, 1).reshape(N)
        new_scores = keepv.reshape(N)

        tok_logprob = new_scores - s["scores"][new_src]
        tok_prob = jnp.exp(tok_logprob)

        tokens = s["tokens"][new_src].at[:, s["step"]].set(new_tok)
        probs = s["probs"][new_src].at[:, s["step"]].set(tok_prob)
        length = s["length"][new_src] + 1
        is_ts = new_tok >= sp.timestamp_begin

        # GATHER-FREE beam reindex: the decode cache stays unpermuted (only
        # in-place single-slot writes touch it — permuting a loop-carried
        # buffer forces XLA into defensive full copies, ~13.8 ms/step);
        # instead the tiny [N, Td] ancestry map follows the surviving beams
        # and rows are dereferenced at read time inside the step
        anc = s["anc"][new_src].at[:, s["step"]].set(
            jnp.arange(s["anc"].shape[0], dtype=jnp.int32))

        step_logits, new_dec = wm.decode_step_split(
            params, cfg, new_tok[:, None], s["step"],
            {"k": s["cache"]["pk"], "v": s["cache"]["pv"]},
            {"k": s["cache"]["dk"], "v": s["cache"]["dv"]},
            cross_cache, prompt_len, beams=K, row_pad=s["row_pad"],
            unroll=_resolve_unroll(dc), anc=anc, mesh=dc.mesh,
            pallas_split=_resolve_pallas_split(dc),
        )
        cache = dict(s["cache"], dk=new_dec["k"], dv=new_dec["v"])

        return dict(
            step=s["step"] + 1,
            logits=step_logits[:, 0],
            cache=cache,
            anc=anc,
            cross=s["cross"],
            no_speech_prob=s["no_speech_prob"],
            row_pad=s["row_pad"],
            tokens=tokens,
            probs=probs,
            scores=new_scores,
            length=length,
            last_was_ts=is_ts,
            penult_was_ts=s["last_was_ts"][new_src],
            max_ts_tok=jnp.where(
                is_ts, jnp.maximum(s["max_ts_tok"][new_src], new_tok),
                s["max_ts_tok"][new_src],
            ),
            ts_seen=s["ts_seen"][new_src] | is_ts,
            fin_tokens=fin_tokens,
            fin_probs=fin_probs,
            fin_scores=fin_scores,
            fin_lengths=fin_lengths,
            fin_count=fin_count,
        )

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("dc",))
def beam_finalize(dc: DecodeConfig, final: Dict[str, Any]) -> DecodeResult:
    """Select each stream's hypothesis: best finished slot by the ranking, or
    the best active beam when nothing finished."""
    B, K, _ = final["fin_tokens"].shape
    no_speech_prob = final["no_speech_prob"]

    # streams with no finished hypothesis fall back to their best active beam
    act_scores = final["scores"].reshape(B, K)
    act_best = jnp.argmax(act_scores, axis=-1)
    act_tokens = final["tokens"].reshape(B, K, -1)
    act_probs = final["probs"].reshape(B, K, -1)
    act_lengths = final["length"].reshape(B, K)

    def pick(fin_arr, act_arr, fin_count, act_idx, fin_idx):
        a = jnp.take_along_axis(
            fin_arr, fin_idx.reshape((B,) + (1,) * (fin_arr.ndim - 1)), 1
        )[:, 0]
        b = jnp.take_along_axis(
            act_arr, act_idx.reshape((B,) + (1,) * (act_arr.ndim - 1)), 1
        )[:, 0]
        has_fin = (fin_count > 0).reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(has_fin, a, b)

    # rank finished hypotheses: avg logprob (sum/(len+1), whisper default)
    # or Google-NMT length penalty ((5+len)/6)^alpha when configured
    if dc.length_penalty is None:
        fin_rank = final["fin_scores"] / jnp.maximum(
            final["fin_lengths"] + 1, 1
        ).astype(jnp.float32)
    else:
        penalty = ((5.0 + final["fin_lengths"].astype(jnp.float32)) / 6.0) ** dc.length_penalty
        fin_rank = final["fin_scores"] / jnp.maximum(penalty, 1e-6)
    fin_best = jnp.argmax(fin_rank, axis=-1)

    tokens = pick(final["fin_tokens"], act_tokens, final["fin_count"], act_best, fin_best)
    probs = pick(final["fin_probs"], act_probs, final["fin_count"], act_best, fin_best)
    lengths = pick(final["fin_lengths"], act_lengths, final["fin_count"], act_best, fin_best)
    sum_lp = pick(final["fin_scores"], act_scores, final["fin_count"], act_best, fin_best)
    avg = sum_lp / jnp.maximum(lengths + 1, 1).astype(jnp.float32)

    return DecodeResult(
        tokens=tokens,
        lengths=lengths,
        sum_logprob=sum_lp,
        avg_logprob=avg,
        token_probs=probs,
        no_speech_prob=no_speech_prob,
    )


def beam_decode(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,  # [B, Ta, D]
    prompt: jnp.ndarray,  # [B, P]
    prompt_len: int,
    suppress_mask: Optional[jnp.ndarray] = None,
    sot_pos: int = 0,
    is_cancelled=None,  # host callback polled every poll_tokens steps
    poll_tokens: int = 32,
    row_pad: Optional[jnp.ndarray] = None,  # [B] per-row prompt left-pad
) -> DecodeResult:
    """Beam search (beam_size K) folded into the batch axis.

    Finished hypotheses are kept in fixed-size per-stream slots; active beams
    continue until every stream has K finished hypotheses or max_tokens is
    reached. Final selection is by avg-logprob (sum/(len+1)), whisper's
    default ranking. With `is_cancelled` set, the loop runs in
    `poll_tokens`-step windows so a cancel lands mid-decode
    (`transcribe.rs:348-350` parity).
    """
    if suppress_mask is None:
        suppress_mask = jnp.asarray(build_suppress_mask(sp, cfg.n_vocab))
    state = beam_init(
        params, cfg, dc, sp, xa, prompt, prompt_len,
        suppress_mask=suppress_mask, sot_pos=sot_pos, row_pad=row_pad,
    )
    max_steps = min(dc.max_tokens, cfg.n_text_ctx - prompt_len - 1)
    if is_cancelled is None:
        state = beam_run(
            params, cfg, dc, sp, state, suppress_mask, prompt_len,
            jnp.int32(max_steps),
        )
    else:
        K = dc.beam_size
        n_fin_target = min(
            int(np.ceil(K * dc.patience)) if dc.patience > 0 else K, K
        )
        budget = 0
        while budget < max_steps:
            budget = min(budget + max(poll_tokens, 1), max_steps)
            state = beam_run(
                params, cfg, dc, sp, state, suppress_mask, prompt_len,
                jnp.int32(budget),
            )
            done = bool(
                (np.asarray(state["fin_count"]) >= n_fin_target).all()
            )
            if done or is_cancelled():
                break
    return beam_finalize(dc, state)


def sample_best_of(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    dc: DecodeConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,  # [B, Ta, D]
    prompt: jnp.ndarray,  # [B, P]
    prompt_len: int,
    best_of: int = 5,
    rng: Optional[jnp.ndarray] = None,
    suppress_mask: Optional[jnp.ndarray] = None,
    sot_pos: int = 0,
    row_pad: Optional[jnp.ndarray] = None,
) -> DecodeResult:
    """Temperature sampling with `best_of` independent candidates per stream,
    ranked by avg logprob — openai-whisper's GreedyDecoder(n_group=best_of)
    used on the temperature-fallback ladder. Candidates fold into the batch
    axis like beams, so the whole pool is one decode loop.
    """
    if best_of <= 1 or dc.temperature <= 0:
        return greedy_decode(
            params, cfg, dc, sp, xa, prompt, prompt_len, rng=rng,
            suppress_mask=suppress_mask, sot_pos=sot_pos, row_pad=row_pad,
        )
    B = xa.shape[0]
    xa_rep = jnp.repeat(xa, best_of, axis=0)
    prompt_rep = jnp.repeat(prompt, best_of, axis=0)
    row_pad_rep = (
        jnp.repeat(row_pad, best_of, axis=0) if row_pad is not None else None
    )
    res = greedy_decode(
        params, cfg, dc, sp, xa_rep, prompt_rep, prompt_len, rng=rng,
        suppress_mask=suppress_mask, sot_pos=sot_pos, row_pad=row_pad_rep,
    )
    avg = res.avg_logprob.reshape(B, best_of)
    best = jnp.argmax(avg, axis=-1)  # [B]

    def pick(a: jnp.ndarray) -> jnp.ndarray:
        g = a.reshape((B, best_of) + a.shape[1:])
        idx = best.reshape((B,) + (1,) * (g.ndim - 1))
        return jnp.take_along_axis(g, idx, axis=1)[:, 0]

    return DecodeResult(
        tokens=pick(res.tokens),
        lengths=pick(res.lengths),
        sum_logprob=pick(res.sum_logprob),
        avg_logprob=pick(res.avg_logprob),
        token_probs=pick(res.token_probs),
        no_speech_prob=pick(res.no_speech_prob),
    )


def detect_language(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    sp: SpecialTokens,
    xa: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Language ID: one decoder step from <|sot|>, softmax over language
    tokens only. Returns (lang_index [B], probs [B, num_languages]).
    Mirrors `full_lang_id_from_state` (`transcribe.rs:392-395`)."""
    logits = wm.detect_language_logits(params, cfg, xa, sp.sot)  # [B, V]
    lang_ids = jnp.arange(sp.num_languages) + (sp.sot + 1)
    lang_logits = logits[:, lang_ids]
    probs = jax.nn.softmax(lang_logits, axis=-1)
    return jnp.argmax(lang_logits, axis=-1), probs
