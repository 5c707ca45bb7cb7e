"""Transcription glue: token streams -> word timestamps -> Segments.

Re-implements the behavior of the reference's `src/transcribe.rs` word
timestamp layer on top of the JAX model/decode/DTW ops:

* `interpolate_word_timestamps` — alnum-length-weighted interpolation for
  translated text (`transcribe.rs:171-203`),
* `get_token_timestamps` — per-token spans with the DTW midpoint-bounds rule
  (`transcribe.rs:273-306`): a token's start is the midpoint of its own and
  its left neighbor's DTW anchors, its end the midpoint with the right
  neighbor; tokens without anchors fall back to t0/t1 estimates,
* control-token filtering (`transcribe.rs:206-240`) — here structural:
  special ids (>= eot) never decode to text, so the printed-marker stripping
  whisper.cpp needs is unnecessary; `is_whole_control_token` is kept for
  input sanitation parity,
* `TranscribeStep`: one batched model invocation over a window of audio
  chunks (mel -> encode -> decode -> DTW) used by the Engine's scheduler.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import whisper as wm
from .ops import decode as dec
from .ops import dtw as dtw_ops
from .ops.mel import N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram
from .types import Segment, WordTimestamp


def interpolate_word_timestamps(line: str, start: float, end: float) -> List[WordTimestamp]:
    """Distribute [start, end] across whitespace tokens weighted by their
    alphanumeric length (`transcribe.rs:171-203`). Used when Whisper's
    translate task makes token times meaningless for the output text."""
    dur = max(end - start, 0.0)
    if dur <= 0.0:
        return []
    tokens = [t for t in line.split() if t.strip("\0").strip()]
    if not tokens:
        return []
    weights = [max(sum(c.isalnum() for c in t), 1) for t in tokens]
    total = sum(weights)
    if total == 0:
        return []
    out: List[WordTimestamp] = []
    acc = 0
    for i, tok in enumerate(tokens):
        t0 = start + (acc / total) * dur
        t1 = end if i + 1 == len(tokens) else start + ((acc + weights[i]) / total) * dur
        acc += weights[i]
        out.append(WordTimestamp(text=tok, start=t0, end=t1, probability=None))
    return out


def is_whole_control_token(s: str) -> bool:
    """True when `s` is exactly a whisper.cpp-style control marker like
    "[_BEG_]" or "[_TT_320]" (`transcribe.rs:206-212`). Our decode path never
    produces these (special ids are filtered before text decode); kept for
    sanitizing externally-supplied token strings."""
    t = s.strip("\0").strip()
    if not (t.startswith("[_") and t.endswith("]")):
        return False
    inner = t[2:-1]
    return bool(inner) and all(c.isupper() or c.isdigit() or c == "_" for c in inner if c.isascii()) and all(c.isascii() for c in inner)


def token_spans(
    texts: Sequence[str],
    probs: Sequence[float],
    anchors: Sequence[Optional[float]],
    t0s: Sequence[float],
    t1s: Sequence[float],
) -> List[WordTimestamp]:
    """Per-token spans via the DTW midpoint rule (`transcribe.rs:291-306`).

    start_i = 0.5*(anchor_{i-1} + anchor_i) when both exist, else t0_i;
    end_i   = 0.5*(anchor_i + anchor_{i+1}) when both exist, else t1_i.
    Word grouping is deferred to `formatting.process_segments`, as in the
    reference (`transcribe.rs:308-319`).
    """
    n = len(texts)
    spans: List[WordTimestamp] = []
    for i in range(n):
        a_prev = anchors[i - 1] if i > 0 else None
        a_here = anchors[i]
        a_next = anchors[i + 1] if i + 1 < n else None
        start = 0.5 * (a_prev + a_here) if (a_prev is not None and a_here is not None) else t0s[i]
        end = 0.5 * (a_here + a_next) if (a_here is not None and a_next is not None) else t1s[i]
        spans.append(WordTimestamp(text=texts[i], start=start, end=end, probability=probs[i]))
    return spans


@dataclasses.dataclass
class ChunkResult:
    """Raw decode output for one audio chunk, in chunk-local time."""

    text: str
    words: List[WordTimestamp]  # token-level spans (chunk-local seconds)
    seg_start: float  # from first/last sampled timestamp token
    seg_end: float
    avg_logprob: float
    no_speech_prob: float
    tokens: List[int]
    # last CLOSING timestamp actually sampled (None when the window ended
    # without a timestamp pair) — drives whisper.cpp-style seek advance
    end_ts: Optional[float] = None


class TranscribeStep:
    """One batched transcription step: window-of-audio -> ChunkResults.

    Compiles once per (model, batch-size, decode-config) and is reused by the
    Engine's chunk scheduler. Where the reference loops chunks serially
    through one whisper.cpp state (`transcribe.rs:376-389`), this runs a
    whole padded batch of chunks per call — the TPU data-parallel axis.
    """

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: wm.WhisperConfig,
        tokenizer,
        model_name: str = "",
        enable_dtw: bool = True,
        decode_config: Optional[dec.DecodeConfig] = None,
        strategy: str = "beam_search",
        max_text_ctx: Optional[int] = None,
        mesh=None,  # jax.sharding.Mesh — multi-chip inference (SURVEY §2.5)
        draft=None,  # (params, cfg) of a vocab-compatible draft model
        spec_gamma: int = 4,  # speculative proposals per round
    ):
        self.params = params
        self.cfg = cfg
        self.tk = tokenizer
        self.sp = tokenizer.specials
        self.enable_dtw = enable_dtw
        self.dc = decode_config or dec.DecodeConfig()
        self.strategy = strategy
        # whisper.cpp's n_max_text_ctx (`transcribe.rs:71-73`): cap on the
        # previous-text tokens carried into the prompt
        self.max_text_ctx = max_text_ctx
        self.heads = wm.alignment_heads_for(model_name, cfg)
        self._suppress = jnp.asarray(
            dec.build_suppress_mask(self.sp, cfg.n_vocab, tokenizer.non_speech_tokens())
        )
        # Multi-chip: parameters shard with the Megatron TP rules, batches
        # shard over "data"; GSPMD propagates the shardings through the
        # jitted encode/decode bodies and inserts the ICI collectives.
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicate, shard_params

            self.params = shard_params(self.params, mesh)
            self._suppress = jax.device_put(self._suppress, replicate(mesh))
        elif (
            dec._resolve_pallas_tail(self.dc) and strategy != "beam_search"
            and (self.dc.quantize_tail_weights
                 or not self.dc.quantize_cross_kv)
        ):
            # fused decoder-tail megakernel: pre-pack the tail projection
            # weights once per model load (`ops/pallas_tail.py`); the pack
            # rides inside the params pytree so the jitted decode loops
            # need no extra plumbing, and decode_step engages the kernel
            # only on single-token steps over the tiled cross cache.
            # A one-time probe compiles the kernels at production geometry
            # first — a Mosaic lowering failure falls back to the un-fused
            # path with a warning instead of killing the transcription.
            # TPU gate verdicts (tools/bench_megakernel.py +
            # bench_quant_kv.py, large-v3 b16): tail KEEP on fp greedy
            # (9.86 -> 9.84 ms/step); the front kernel lost (9.95) and is
            # not attached; beam-5 with the ~2 GB pack resident OOMs v5e
            # HBM on top of the split beam cache, hence the strategy
            # guard. With int8 cross-KV the PLAIN flash path wins (q8kv
            # 7.64 vs q8kv+tail 7.76 vs q8(kv+w)+tail 7.78), so the pack
            # is skipped under quantize_cross_kv unless the caller opts
            # into int8 weight tiles (the small-batch lever: at b<=4 the
            # weight stream, not the cross cache, dominates a step).
            from .ops.pallas_tail import (
                megakernels_supported, pack_tail_weights)

            if megakernels_supported(
                cfg.n_text_state, cfg.n_text_head,
                wq=self.dc.quantize_tail_weights,
                kvq=self.dc.quantize_cross_kv,
            ):
                self.params = {
                    **self.params,
                    "decoder": {
                        **self.params["decoder"],
                        "tail": pack_tail_weights(
                            self.params, cfg,
                            quantize=self.dc.quantize_tail_weights),
                    },
                }
        self._encode = jax.jit(lambda p, m: wm.encode(p, m, cfg))
        self._align = jax.jit(
            lambda p, t, xa: wm.alignment_cross_attn(p, cfg, t, xa, self.heads)
        )
        # fused teacher-forced alignment pass + on-device DTW cost reduction:
        # only the [B, S, Ta] cost matrix crosses the (slow, tunneled) host
        # link instead of [B, K, S, Ta] attention maps
        self._align_cost = jax.jit(
            lambda p, t, xa, nf, nr: dtw_ops.alignment_cost_batch(
                wm.alignment_cross_attn(p, cfg, t, xa, self.heads), nf, nr
            )
        )
        # fully on-device alignment: cost reduction + DTW DP + backtrack in
        # one dispatch; only [B, N] i32 anchor frames cross the host link
        # (WDT_HOST_DTW=1 falls back to the fetched-cost + host-DP path)
        self._align_anchors = jax.jit(
            lambda p, t, xa, nf, nr, nt, sl: dtw_ops.dtw_anchor_frames_batch(
                dtw_ops.alignment_cost_batch(
                    wm.alignment_cross_attn(p, cfg, t, xa, self.heads),
                    nf, nr,
                ),
                nt, nf, sl,
            ),
            static_argnums=(6,),
        )
        sot_id = self.sp.sot
        self._detect = jax.jit(
            lambda p, xa: wm.detect_language_logits(p, cfg, xa, sot_id)
        )
        # speculative greedy decoding (`ops/speculative.py`): the draft
        # proposes spec_gamma tokens per target verification pass; output is
        # exact (always the target's own argmax). Greedy-only, single-device.
        self.draft = draft if mesh is None else None
        self.spec_gamma = spec_gamma
        if self.draft is not None:
            dparams, dcfg = self.draft
            self._encode_d = jax.jit(
                lambda p, m: wm.encode(p, m, dcfg))

    # -- model invocations ---------------------------------------------------
    def _place_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """Shard a [B, ...] array's batch axis over the mesh's data axis."""
        if self.mesh is None:
            return x
        from .parallel.mesh import data_sharding

        return jax.device_put(x, data_sharding(self.mesh, x.ndim))

    def place_audio(self, audio_batch: np.ndarray) -> jnp.ndarray:
        """Upload an audio batch once; mel, decode and speaker embeddings all
        consume the same device array."""
        return self._place_batch(jnp.asarray(audio_batch))

    def mel(self, audio_batch) -> jnp.ndarray:
        """[B, N_SAMPLES] float32 (host or device) -> [B, n_mels, 3000]
        (MXU-matmul XLA path; mel is ~1.4 ms of a ~640 ms large-v3 window —
        the fused Pallas frontend lives in tools/pallas_mel.py, quarantined
        per VERDICT r3 #7)."""
        return log_mel_spectrogram(
            self._place_batch(jnp.asarray(audio_batch)),
            n_mels=self.cfg.n_mels)

    def encode(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self._encode(self.params, mel)

    def encode_draft(self, audio_dev: jnp.ndarray) -> jnp.ndarray:
        """Draft-model encoding from the already-uploaded audio (the draft
        may use a different mel bank count than the target)."""
        dparams, dcfg = self.draft
        mel_d = log_mel_spectrogram(audio_dev, n_mels=dcfg.n_mels)
        return self._encode_d(dparams, mel_d)

    def _build_prompt(
        self,
        batch: int,
        language,  # str | None | Sequence[str] (per batch row)
        task: str,
        prev_tokens=None,  # None | Sequence[int] | per-row Sequence[Optional[Sequence[int]]]
    ) -> Tuple[jnp.ndarray, int, int, Optional[jnp.ndarray]]:
        """Returns (prompt [B, P] int32, prompt_len, sot_pos, row_pad).

        `language` may be a per-row sequence — rows get their own language
        token (mixed-language multi-stream batches). `prev_tokens` may also
        be per row (each stream's rolling `previous_text`,
        `transcribe.rs:384-386`): rows are left-padded to a shared bucket and
        `row_pad` [B] carries each row's pad so the decoder can mask it.
        """
        keep = self.cfg.n_text_ctx // 2 - 1
        if self.max_text_ctx is not None:
            keep = min(keep, max(self.max_text_ctx, 0))

        per_row = (
            prev_tokens is not None
            and len(prev_tokens) > 0
            and isinstance(prev_tokens[0], (list, tuple, np.ndarray, type(None)))
            and not isinstance(prev_tokens, (bytes, str))
        )
        if per_row:
            assert len(prev_tokens) == batch
            rows_prev = list(prev_tokens)
        else:
            rows_prev = [prev_tokens] * batch

        def make_prefix(pt):
            if pt is None or len(pt) == 0 or keep <= 0:
                return []
            return [self.sp.sot_prev] + list(pt)[-keep:]

        prefixes = [make_prefix(pt) for pt in rows_prev]
        max_pref = max((len(p) for p in prefixes), default=0)
        # bucket the prefix length (8) so the jit cache sees few prompt shapes
        pref_bucket = -(-max_pref // 8) * 8 if max_pref else 0

        if language is None or isinstance(language, str):
            langs = [language or "en"] * batch
        else:
            langs = [l or "en" for l in language]
            assert len(langs) == batch

        pads = [pref_bucket - len(p) for p in prefixes]
        rows = [
            [self.sp.sot] * pad + p + self.tk.sot_sequence(task=task, language=l)
            for pad, p, l in zip(pads, prefixes, langs)
        ]
        prompt = self._place_batch(jnp.asarray(np.asarray(rows, np.int32)))
        sot_pos = pref_bucket  # <|sot|> right after the (padded) prefix
        row_pad = None
        if any(pads):
            row_pad = self._place_batch(jnp.asarray(np.asarray(pads, np.int32)))
        return prompt, len(rows[0]), sot_pos, row_pad

    def decode(
        self,
        xa: jnp.ndarray,
        language,  # str | None | Sequence[str]
        task: str,
        prev_tokens: Optional[Sequence[int]] = None,
        rng: Optional[jnp.ndarray] = None,
        is_cancelled=None,  # poll mid-decode (`transcribe.rs:348-350` parity)
        xa_d=None,  # draft-encoded audio: array or lazy () -> array
    ) -> dec.DecodeResult:
        B = xa.shape[0]
        prompt, prompt_len, sot_pos, row_pad = self._build_prompt(
            B, language, task, prev_tokens
        )
        if (self.strategy == "greedy" and self.draft is not None
                and xa_d is not None and self.dc.temperature == 0
                and row_pad is None):
            # speculative rounds need uniform prompts (per-row row_pad
            # prompts fall back to plain greedy); cancellation polls
            # between ~8-round budget windows (~gamma x 8 tokens), the
            # same ~1 s granularity as plain greedy's 32-token windows
            from .ops import speculative as spec_mod

            dparams, dcfg = self.draft
            return spec_mod.speculative_greedy_decode(
                self.params, self.cfg, dparams, dcfg, self.dc, self.sp,
                xa, xa_d() if callable(xa_d) else xa_d, prompt, prompt_len,
                suppress_mask=self._suppress, gamma=self.spec_gamma,
                sot_pos=sot_pos, is_cancelled=is_cancelled,
                poll_rounds=max(1, 32 // max(self.spec_gamma, 1)),
            )
        if self.strategy == "greedy":
            if self.dc.temperature > 0 and self.dc.beam_size > 1:
                # best_of_or_beam_size doubles as best_of for sampling
                # (`transcribe.rs:22`; openai GreedyDecoder n_group)
                return dec.sample_best_of(
                    self.params, self.cfg, self.dc, self.sp, xa, prompt,
                    prompt_len, best_of=self.dc.beam_size, rng=rng,
                    suppress_mask=self._suppress, sot_pos=sot_pos,
                    row_pad=row_pad,
                )
            return dec.greedy_decode(
                self.params, self.cfg, self.dc, self.sp, xa, prompt,
                prompt_len, rng=rng, suppress_mask=self._suppress,
                sot_pos=sot_pos, is_cancelled=is_cancelled, row_pad=row_pad,
            )
        return dec.beam_decode(
            self.params, self.cfg, self.dc, self.sp, xa, prompt,
            prompt_len, suppress_mask=self._suppress, sot_pos=sot_pos,
            is_cancelled=is_cancelled, row_pad=row_pad,
        )

    def decode_with_fallback(
        self,
        xa: jnp.ndarray,
        language,  # str | None | Sequence[str]
        task: str,
        prev_tokens: Optional[Sequence[int]] = None,
        temperatures: Sequence[float] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        n_valid_rows: Optional[int] = None,
        best_of: Optional[int] = None,
        is_cancelled=None,
        xa_d: Optional[jnp.ndarray] = None,  # draft audio for the t=0 pass
    ) -> Tuple[dec.DecodeResult, np.ndarray]:
        """Temperature-fallback decoding (whisper.cpp runs the same policy
        inside `state.full`, which the reference relies on at
        `transcribe.rs:389`): decode at t=0 (beam/greedy), and re-decode
        windows whose text is degenerate (gzip compression ratio above
        threshold) or improbable (avg logprob below threshold) at increasing
        temperatures, keeping per-window best results.

        openai-whisper fidelity: retries keep the SAME prompt (the t>0.5
        prompt reset applies to the *next* window's carried text — returned
        here as per-row final temperatures for the Engine to act on), use
        sampling with `best_of` parallel candidates ranked by avg logprob,
        and only rows in [0, n_valid_rows) are ever judged — silent padding
        rows of a partial batch must not trigger 5 retry ladders.

        Returns (result, final_temperature_per_row).
        """
        import zlib

        import jax as _jax

        result = self.decode(
            xa, language, task, prev_tokens=prev_tokens,
            is_cancelled=is_cancelled, xa_d=xa_d,
        )
        B = xa.shape[0]
        n_valid_rows = B if n_valid_rows is None else n_valid_rows
        best_of = best_of or self.dc.beam_size
        temps = np.zeros((B,), np.float32)

        def failures(res: dec.DecodeResult) -> np.ndarray:
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            avg = np.asarray(res.avg_logprob)
            bad = np.zeros(toks.shape[0], bool)
            for b in range(min(toks.shape[0], n_valid_rows)):
                text = self.tk.decode([int(t) for t in toks[b, : lens[b]]])
                data = text.encode("utf-8")
                if len(data) > 16:
                    ratio = len(data) / len(zlib.compress(data))
                    if ratio > compression_ratio_threshold:
                        bad[b] = True
                if avg[b] < logprob_threshold:
                    bad[b] = True
            return bad

        bad = failures(result)
        for ti, temp in enumerate(temperatures[1:], start=1):
            if not bad.any() or (is_cancelled and is_cancelled()):
                break
            retry_dc = dataclasses.replace(
                self.dc, temperature=float(temp), beam_size=1
            )
            prompt, prompt_len, sot_pos, row_pad = self._build_prompt(
                B, language, task, prev_tokens=prev_tokens
            )
            retry = dec.sample_best_of(
                self.params, self.cfg, retry_dc, self.sp, xa, prompt,
                prompt_len, best_of=best_of, rng=_jax.random.PRNGKey(ti),
                suppress_mask=self._suppress, sot_pos=sot_pos,
                row_pad=row_pad,
            )
            # merge retry rows into the kept result where the old row failed
            sel = jnp.asarray(bad)
            merged = {}
            for field_ in dataclasses.fields(dec.DecodeResult):
                old = getattr(result, field_.name)
                new = getattr(retry, field_.name)
                shape_sel = sel.reshape((-1,) + (1,) * (old.ndim - 1))
                merged[field_.name] = jnp.where(shape_sel, new, old)
            result = dec.DecodeResult(**merged)
            temps[bad] = float(temp)
            bad = failures(result) & bad  # only previously-bad rows re-judged
        return result, temps

    def detect_language(self, xa: jnp.ndarray) -> List[str]:
        logits = self._detect(self.params, xa)  # jitted: one dispatch
        lang_ids = np.arange(self.sp.num_languages) + (self.sp.sot + 1)
        idx = np.asarray(logits)[:, lang_ids].argmax(-1)
        from .tokenizer import LANGUAGES

        return [LANGUAGES[int(i)] for i in idx]

    # -- result assembly -----------------------------------------------------
    def start_alignment(
        self,
        result: dec.DecodeResult,
        xa: jnp.ndarray,
        chunk_samples: Sequence[int],
        translated: bool,
    ):
        """Dispatch the batched teacher-forced alignment pass and return a
        host thunk computing per-row DTW anchor times (None when DTW is
        off/empty/translated).

        The device work is enqueued here (async dispatch); the thunk only
        fetches the reduced [B, S, Ta] cost matrix and runs the host DTW
        backtrack. The Engine runs the thunk on a worker thread so the
        backtrack overlaps the NEXT batch's device decode instead of
        serializing with it (the reference interleaves whisper.cpp's own
        DTW with nothing, `transcribe.rs:273-306`)."""
        if not (self.enable_dtw and not translated):
            return None
        tokens = np.asarray(result.tokens)
        lengths = np.asarray(result.lengths)
        B = tokens.shape[0]
        max_len = int(lengths.max()) if B else 0
        if max_len == 0:
            return None
        # pad the token axis to a 32-bucket so the jitted alignment
        # pass compiles once per bucket, not once per length
        max_len = min(-(-max_len // 32) * 32, self.cfg.n_text_ctx - 8)
        sot = self.tk.sot_sequence(language="en")  # timing-only pass
        pad = np.full((B, max_len), self.sp.eot, np.int32)
        for b in range(B):
            pad[b, : lengths[b]] = tokens[b, : lengths[b]]
        seq = np.concatenate(
            [np.tile(np.array(sot, np.int32), (B, 1)), pad], axis=1
        )
        n_frames_arr = np.array(
            [
                max(min(
                    int(np.ceil(chunk_samples[b] / (SAMPLE_RATE * dtw_ops.FRAME_SECONDS))),
                    self.cfg.n_audio_ctx,
                ), 1)
                for b in range(B)
            ],
            np.int32,
        )
        # valid token rows for the standardization: sot + text + eot
        n_rows_arr = np.minimum(
            len(sot) + lengths.astype(np.int32) + 1, seq.shape[1]
        )
        sot_len = len(sot)
        if os.environ.get("WDT_HOST_DTW", "") != "1":
            # device path: DP + backtrack on chip, fetch only [B, N] anchor
            # frames (~KBs) instead of the [B, S, Ta] f32 cost (~MBs)
            frames_dev = self._align_anchors(
                self.params, jnp.asarray(seq), xa,
                jnp.asarray(n_frames_arr), jnp.asarray(n_rows_arr),
                jnp.asarray(lengths.astype(np.int32)), sot_len,
            )

            def backtrack_dev() -> List[Optional[np.ndarray]]:
                frames = np.asarray(frames_dev)  # tiny host fetch
                anchors_all: List[Optional[np.ndarray]] = [None] * B
                for b in range(B):
                    n_tok = int(lengths[b])
                    if n_tok == 0:
                        continue
                    anchors_all[b] = (
                        frames[b, :n_tok].astype(np.float64)
                        * dtw_ops.FRAME_SECONDS
                    )
                return anchors_all

            return backtrack_dev

        cost_dev = self._align_cost(
            self.params, jnp.asarray(seq), xa,
            jnp.asarray(n_frames_arr), jnp.asarray(n_rows_arr),
        )

        def backtrack() -> List[Optional[np.ndarray]]:
            cost = np.asarray(cost_dev)  # host fetch (worker thread)
            anchors_all: List[Optional[np.ndarray]] = [None] * B
            for b in range(B):
                n_tok = int(lengths[b])
                if n_tok == 0:
                    continue
                # rows: the sampled text tokens only (sot rows dropped,
                # like openai's matrix[len(sot_sequence):-1])
                cost_b = cost[b][sot_len: sot_len + n_tok, : n_frames_arr[b]]
                anchors_all[b] = dtw_ops.anchor_times_from_cost(
                    np.ascontiguousarray(cost_b), n_tok
                )
            return anchors_all

        return backtrack

    def build_chunk_results(
        self,
        result: dec.DecodeResult,
        xa: jnp.ndarray,
        chunk_samples: Sequence[int],  # valid samples per batch row
        translated: bool,
        anchors_all: Optional[List[Optional[np.ndarray]]] = None,
    ) -> List[ChunkResult]:
        """Host-side: token ids -> text + token-level word spans per chunk.

        `anchors_all` carries precomputed DTW anchors from a
        `start_alignment` thunk (the Engine's pipelined path); None runs
        the alignment pass inline (serial path, identical output)."""
        tokens = np.asarray(result.tokens)
        lengths = np.asarray(result.lengths)
        probs = np.asarray(result.token_probs)
        avg_lp = np.asarray(result.avg_logprob)
        nsp = np.asarray(result.no_speech_prob)
        B = tokens.shape[0]

        if anchors_all is None:
            thunk = self.start_alignment(result, xa, chunk_samples, translated)
            anchors_all = thunk() if thunk is not None else [None] * B

        out: List[ChunkResult] = []
        for b in range(B):
            n = int(lengths[b])
            toks = [int(t) for t in tokens[b, :n]]
            chunk_dur = chunk_samples[b] / SAMPLE_RATE

            ts_values = [
                self.sp.timestamp_value(t) for t in toks if self.sp.is_timestamp(t)
            ]
            seg_start = ts_values[0] if ts_values else 0.0
            seg_end = ts_values[-1] if len(ts_values) > 1 else chunk_dur
            end_ts = ts_values[-1] if len(ts_values) > 1 else None

            text_idx = [i for i, t in enumerate(toks) if t < self.sp.eot]
            texts = [self.tk.decode_token(toks[i]) for i in text_idx]
            tprobs = [float(probs[b, i]) for i in text_idx]

            # fallback t0/t1: distribute [seg_start, seg_end] over text tokens
            # weighted by alnum length (the reference falls back to
            # whisper.cpp's per-token t0/t1; ours derive from the sampled
            # timestamp tokens)
            weights = [max(sum(c.isalnum() for c in t), 1) for t in texts]
            total_w = max(sum(weights), 1)
            t0s, t1s = [], []
            acc = 0
            for w in weights:
                t0s.append(seg_start + (seg_end - seg_start) * acc / total_w)
                acc += w
                t1s.append(seg_start + (seg_end - seg_start) * acc / total_w)

            anchors: List[Optional[float]] = [None] * len(text_idx)
            if anchors_all[b] is not None:
                aa = anchors_all[b]
                anchors = [float(aa[i]) if i < len(aa) else None for i in text_idx]

            words = token_spans(texts, tprobs, anchors, t0s, t1s)
            # drop empty/whitespace-only token spans (control-token parity,
            # `transcribe.rs:266-270`)
            words = [w for w in words if w.text.strip("\0").strip()]

            text = "".join(texts).lstrip()  # whisper's leading space trimmed
            out.append(
                ChunkResult(
                    text=text,
                    words=words,
                    seg_start=seg_start,
                    seg_end=seg_end,
                    avg_logprob=float(avg_lp[b]),
                    no_speech_prob=float(nsp[b]),
                    tokens=toks,
                    end_ts=end_ts,
                )
            )
        return out
