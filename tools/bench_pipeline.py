"""Measure stage pipelining (PP) — SURVEY.md §2.3 row 5 says "measure first".

Reports:
  - t_front / t_back: per-stage wall time of the split RxChain halves.
    The PP speedup ceiling over a 2-device pipeline is
    (t_front + t_back) / max(t_front, t_back); if the front end dominates
    (it does — it runs at full input rate, the back end at 1/decim of it),
    the ceiling is barely above 1 and channel/time sharding remains the
    right scaling axis. This number is the point of the exercise.
  - pipelined vs sequential wall clock over >= 2 devices (CPU mesh here;
    the structure is identical on a real multi-chip slice).

Run:  python tools/bench_pipeline.py            (forces 2-device CPU)
      RADIOFRAME_BENCH_TPU=1 python tools/...   (stage times on the 1 chip)
"""

import os
import sys
import time

if not os.environ.get("RADIOFRAME_BENCH_TPU") and os.environ.get("JAX_PLATFORMS") != "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2").strip()
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from radioframe.core.config import CicStage, FirStage, RxConfig
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain
from radioframe.shard.pipeline import PipelinedRx


def main():
    on_cpu = jax.default_backend() == "cpu"
    C = 32 if on_cpu else 128
    cfg = RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512,
        fuse_frontend=not on_cpu,
        fuse_frontend_depth=2,
    )
    chain = RxChain(cfg)
    T = 8 * chain.min_block
    n_blocks = 6 if on_cpu else 64
    rng = np.random.default_rng(0)
    blocks_np = [(rng.standard_normal((C, T)) + 1j
                  * rng.standard_normal((C, T))).astype(np.complex64)
                 for _ in range(n_blocks)]
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    # --- per-stage times on device 0 (axon-safe: all iterations inside ONE
    # executable, f32-plane input, sync by fetching an f32 scalar; complex
    # arrays never cross host<->device) ------------------------------------
    iq_ri = jnp.asarray(np.stack([np.real(blocks_np[0]),
                                  np.imag(blocks_np[0])]).astype(np.float32))

    def front_loop(fstate, iq_ri, words, n):
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])

        def body(_, carry):
            st, acc = carry
            st, x, pw = chain.step_front(st, iq, words)
            return st, acc + pw[0] + jnp.abs(x[0, -1])

        return jax.lax.fori_loop(0, n, body, (fstate, jnp.float32(0)))

    def back_loop(bstate, x, mode, pw, n):
        def body(_, carry):
            st, acc = carry
            st, a, _ = chain.step_back(st, x, mode, pw)
            return st, acc + a[0, -1]

        return jax.lax.fori_loop(0, n, body, (bstate, jnp.float32(0)))

    frontj = jax.jit(front_loop, static_argnames="n", donate_argnums=0)
    backj = jax.jit(back_loop, static_argnames="n", donate_argnums=0)
    # init INSIDE jit: eager complex-array creation is op-by-op dispatch,
    # unimplemented through the axon tunnel
    fstate, bstate = jax.jit(lambda: chain.split_state(chain.init_state(C)))()

    @jax.jit
    def _front_once(fstate, iq_ri, words):
        # complex built INSIDE jit (axon: op-by-op complex dispatch is
        # unimplemented); x stays device-resident for back_loop's arg
        _, x, pw = chain.step_front(fstate, jax.lax.complex(iq_ri[0], iq_ri[1]), words)
        return x, pw

    x, pw = _front_once(fstate, iq_ri, words)

    fstate, s = frontj(fstate, iq_ri, words, n=n_blocks)
    float(s)
    t0 = time.perf_counter()
    fstate, s = frontj(fstate, iq_ri, words, n=n_blocks)
    float(s)
    t_front = (time.perf_counter() - t0) / n_blocks

    bstate, s = backj(bstate, x, mode, pw, n=n_blocks)
    float(s)
    t0 = time.perf_counter()
    bstate, s = backj(bstate, x, mode, pw, n=n_blocks)
    float(s)
    t_back = (time.perf_counter() - t0) / n_blocks
    ceiling = (t_front + t_back) / max(t_front, t_back)
    print(f"stage times: t_front={t_front*1e3:.2f} ms  t_back={t_back*1e3:.2f} ms"
          f"  -> 2-device PP speedup ceiling = {ceiling:.3f}x")

    if len(jax.devices()) < 2:
        print("single device: pipelined run skipped (ceiling above is the result)")
        return

    # --- sequential vs pipelined wall clock (CPU-mesh path only) ----------
    blocks = [jnp.asarray(b) for b in blocks_np]
    step = jax.jit(chain.step)
    state = chain.init_state(C)
    state, audio, _ = step(state, blocks[0], words, mode)
    jax.block_until_ready(audio)
    t0 = time.perf_counter()
    for iq in blocks:
        state, audio, _ = step(state, iq, words, mode)
    jax.block_until_ready(audio)
    t_seq = time.perf_counter() - t0

    pipe = PipelinedRx(chain, jax.devices()[0], jax.devices()[1])
    fs, bs = pipe.init_states(C)
    fs, bs, audios, _ = pipe.run(fs, bs, blocks[:2], words, mode)  # warm both
    fs, bs = pipe.init_states(C)
    t0 = time.perf_counter()
    fs, bs, audios, _ = pipe.run(fs, bs, blocks, words, mode)
    jax.block_until_ready(audios[-1])
    t_pipe = time.perf_counter() - t0
    print(f"sequential (1 dev): {t_seq*1e3:.1f} ms for {n_blocks} blocks; "
          f"pipelined (2 dev): {t_pipe*1e3:.1f} ms  -> {t_seq/t_pipe:.3f}x")


if __name__ == "__main__":
    main()
