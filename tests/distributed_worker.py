"""Worker for the 2-process `jax.distributed` test (multi-host scale-out,
SURVEY §2.5 "TPU-native mapping": DCN multi-host is the stated scale-out
story; the reference itself is single-process, `Cargo.lock` has no comm
backend).

Launched by `tests/test_parallel.py::test_distributed_two_process` as
  python tests/distributed_worker.py <coordinator> <process_id> <n_proc>
with XLA_FLAGS=--xla_force_host_platform_device_count=4, so the pair forms
an 8-device global ("data", "model") mesh (4 local CPU devices each; the
model axis stays within a process, as TP groups stay within an ICI slice).

Runs the real multi-host recipe end to end:
  * `distributed.initialize` with explicit cluster args,
  * `distributed.global_mesh` over ALL processes' devices,
  * parameters sharded with the Megatron TP rules (`shard_params` issues
    jax.device_put to the global sharding from identical host values),
  * ONE AdamW train step and ONE greedy decode step on batches fed
    per-process via `distributed.local_batch_slice` +
    `jax.make_array_from_process_local_data`,
  * cross-process agreement check: every process fetches the (replicated)
    loss and the decoded tokens of the full global batch and prints them
    for the launcher to compare.
"""

from __future__ import annotations

import sys


def main(coordinator: str, process_id: int, n_proc: int) -> None:
    import jax

    # the site hook re-asserts JAX_PLATFORMS=axon; force CPU before backend init
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_diarize_tpu import training
    from whisper_diarize_tpu.models import whisper as wm
    from whisper_diarize_tpu.ops import decode as dec
    from whisper_diarize_tpu.ops.mel import log_mel_spectrogram
    from whisper_diarize_tpu.parallel import distributed as dist
    from whisper_diarize_tpu.parallel.mesh import data_sharding, shard_params
    from whisper_diarize_tpu.tokenizer import DebugTokenizer

    dist.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=process_id,
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * n_proc, jax.device_count()

    mesh = dist.global_mesh(n_model=2)
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] == 2 * n_proc
    # TP groups must not straddle processes (DCN would carry every psum)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "model group straddles processes")

    cfg = wm.WhisperConfig(
        n_mels=80, n_vocab=51872,
        n_audio_ctx=1500, n_audio_state=64, n_audio_head=2, n_audio_layer=2,
        n_text_ctx=448, n_text_state=64, n_text_head=2, n_text_layer=2,
    )
    # identical host values on every process (same seed) -> device_put to
    # the global TP shardings is well-defined
    params = shard_params(wm.init_params(cfg, seed=0), mesh)

    optimizer = training.make_optimizer()
    opt_state = optimizer.init(params)

    # --- per-process batch feeding: each process materializes ONLY its
    # local_batch_slice rows and assembles the global array from them ---
    B = mesh.shape["data"]  # one row per data-mesh position
    S = 8
    rng = np.random.default_rng(7)  # same stream everywhere; slice per rank
    mel_host = rng.standard_normal((B, cfg.n_mels, 3000)).astype(np.float32)
    audio_host = rng.standard_normal((B, 16000)).astype(np.float32) * 0.1
    tokens_host = np.tile(np.arange(S, dtype=np.int32), (B, 1))
    mask_host = np.ones((B, S - 1), np.float32)

    rows = dist.local_batch_slice(B)

    def feed(host_arr):
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, host_arr.ndim), host_arr[rows])

    train_step = training.make_train_step(cfg, optimizer)
    params, opt_state, loss = train_step(
        params, opt_state, feed(mel_host), feed(tokens_host), feed(mask_host))
    loss_val = float(loss)  # loss is replicated: fetchable on every process
    assert np.isfinite(loss_val), loss_val

    # --- one greedy decode step over the same mesh (the serving path) ---
    tk = DebugTokenizer(num_languages=cfg.num_languages)
    sp = tk.specials
    dc = dec.DecodeConfig(max_tokens=4, blank_id=32, mesh=mesh,
                          unroll_layers=False)
    prompt_host = np.tile(
        np.array(tk.sot_sequence(language="en"), np.int32), (B, 1))
    audio = feed(audio_host)
    prompt = feed(prompt_host)
    mel_i = jax.jit(
        lambda a: log_mel_spectrogram(a, n_mels=cfg.n_mels,
                                      padding=480000 - 16000),
        out_shardings=data_sharding(mesh, 3),
    )(audio)
    xa = jax.jit(lambda p, m: wm.encode(p, m, cfg))(params, mel_i)
    res = dec.greedy_decode(params, cfg, dc, sp, xa, prompt, prompt_host.shape[1])
    # replicate the result so every process can fetch the full global batch
    toks = np.asarray(jax.device_put(
        res.tokens, NamedSharding(mesh, P())))
    assert toks.shape[0] == B

    print("RESULT", process_id, loss_val, toks.ravel().tolist(), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
