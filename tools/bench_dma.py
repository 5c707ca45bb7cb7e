"""HBM streaming-bandwidth microbenchmark: XLA vs Pallas pipelining variants.

CONCLUSION (round-2 continuation, stable slope timing): all three variants
converge to ~740 GB/s ≈ 90% of the v5e 819 GB/s peak — there is NO
bandwidth headroom in the cross-KV stream and manual DMA is NOT a lever.
An earlier reading of "Pallas ~440 GB/s vs XLA ~700" was tunnel-dispatch
jitter at low rep counts (retracted; see `ops/pallas_attn.py` docstring and
CLAUDE.md). This file remains as the measurement harness + methodology
record.

Measures the effective read bandwidth of streaming a cross-KV-sized array
(the decode loop's dominant traffic) three ways:

  A. XLA fused reduction (`jnp.sum`).
  B. Auto-pipelined Pallas (grid + BlockSpec, like `ops/pallas_attn.py`).
  C. Manual multi-buffered DMA (`pltpu.make_async_copy`, N slots deep).

Run on the real TPU:  python tools/bench_dma.py
Timing rules (CLAUDE.md): only a host fetch synchronizes, and every
variant takes a loop-carried scalar so XLA cannot hoist the streaming pass
out of the repeat loop. Two repeat counts, slope reported (cancels
dispatch latency).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, DH, TT = 20, 64, 512  # one cross-KV tile, large-v3/turbo geometry
NT = 48  # 16 streams x 3 tiles


def _tile_sum_kernel(s_ref, x_ref, o_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0, 0] = 0.0

    acc_ref[0, 0] += jnp.sum(
        jnp.maximum(x_ref[...].astype(jnp.float32), s_ref[0, 0])
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[0, 0] = acc_ref[0, 0]


def auto_sum(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[0]
    return pl.pallas_call(
        _tile_sum_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, DH, TT), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
    )(s.reshape(1, 1), x)


def _manual_kernel(nbuf: int, chunk: int, s_ref, x_ref, o_ref):
    n = x_ref.shape[0] // chunk

    def body(scratch, sem):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * chunk, chunk)], scratch.at[slot],
                sem.at[slot],
            )

        for i in range(nbuf - 1):
            get_dma(i, i).start()

        def loop(i, acc):
            slot = jax.lax.rem(i, nbuf)

            @pl.when(i + nbuf - 1 < n)
            def _():
                get_dma(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

            get_dma(slot, i).wait()
            return acc + jnp.sum(
                jnp.maximum(scratch[slot].astype(jnp.float32), s_ref[0, 0])
            )

        o_ref[0, 0] = jax.lax.fori_loop(0, n, loop, jnp.float32(0.0))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((nbuf, chunk, H, DH, TT), x_ref.dtype),
        sem=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def manual_sum(x: jnp.ndarray, s: jnp.ndarray, nbuf: int,
               chunk: int = 1) -> jnp.ndarray:
    return pl.pallas_call(
        functools.partial(_manual_kernel, nbuf, chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )(s.reshape(1, 1), x)


def timed(fn, x, reps_lo=8, reps_hi=40):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(x, reps):
        def step(acc, _):
            # acc feeds back into the pass -> the pass cannot be hoisted
            return fn(x, acc * 1e-30 - 1e30).reshape(()) * 1e-6 + acc * 1e-6, None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=reps)
        return acc

    out = {}
    for reps in (reps_lo, reps_hi):
        r = run(x, reps)
        np.asarray(r)  # warm compile + sync
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x, reps))
            best = min(best, time.perf_counter() - t0)
        out[reps] = best
    per_pass = (out[reps_hi] - out[reps_lo]) / (reps_hi - reps_lo)
    return per_pass


def main() -> None:
    print(f"backend={jax.default_backend()}")
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((NT, H, DH, TT)), jnp.bfloat16
    )
    nbytes = x.size * x.dtype.itemsize
    print(f"array: {x.shape} bf16 = {nbytes/1e6:.1f} MB")

    rows = [
        ("xla_sum",
         lambda a, s: jnp.sum(jnp.maximum(a.astype(jnp.float32), s))),
        ("pallas_auto", auto_sum),
    ]
    for nbuf in (2, 3, 4, 6, 8):
        rows.append((f"manual_nbuf{nbuf}", functools.partial(manual_sum, nbuf=nbuf)))
    rows.append(
        ("manual_nbuf4_chunk2", functools.partial(manual_sum, nbuf=4, chunk=2))
    )
    rows.append(
        ("manual_nbuf2_chunk2", functools.partial(manual_sum, nbuf=2, chunk=2))
    )

    for name, fn in rows:
        try:
            per_pass = timed(fn, x)
            print(f"{name:24s} {per_pass*1e3:7.3f} ms/pass  "
                  f"{nbytes/per_pass/1e9:6.1f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
