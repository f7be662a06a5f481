"""Per-stage timing of the M=4096 channelizer on the real TPU.

The channelizer bench sustains ~0.7 Gsps wideband while the PFB+DFT pair
alone sustains ~1.0 (tools/probe_pfb.py), so the audio-rate back end
(demod bank + AGC + waterfall at aggregate rate == wideband rate for a
critically-sampled channelizer) carries the rest. This probe times each
stage in isolation — same fori_loop-in-one-executable + scalar-fetch-sync
discipline as bench.py (axon tunnel: block_until_ready doesn't block,
per-dispatch round trip ~25 ms).

Usage: python tools/probe_channelizer.py [stage ...]
  stages: pfb fft demod agc waterfall full  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig

M, ITERS, BLOCK_MULT = 4096, 8, 128


def timeit(name, loop_fn, state0, *args):
    runj = jax.jit(loop_fn, static_argnames="n", donate_argnums=0)
    st, s = runj(state0, *args, n=ITERS)  # state0 donated here
    float(s)
    t0 = time.perf_counter()
    st, s = runj(st, *args, n=ITERS)  # thread the fresh state, not state0
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:12s} {dt*1e3:9.2f} ms/block", flush=True)
    return dt


def main():
    which = set(sys.argv[1:]) or {"pfb", "fft", "demod", "agc", "waterfall", "full"}
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, spectrum_nfft=4096)
    chain = ChannelizerChain(cfg)
    T = BLOCK_MULT * chain.min_block
    F = T // M
    rng = np.random.default_rng(0)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    ch_ri = jnp.asarray(rng.standard_normal((2, M, F)).astype(np.float32))
    au = jnp.asarray(rng.standard_normal((M, F)).astype(np.float32))
    mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
    print(f"M={M} T={T} ({T/1e6:.2f} M wideband samples, {F} frames/ch, "
          f"{ITERS} iters)", flush=True)

    if "full" in which:
        def full_loop(state, wb_ri, mode, n):
            wide = jax.lax.complex(wb_ri[0], wb_ri[1])

            def body(_, c):
                st, acc = c
                st, audio, aux = chain.step(st, wide, mode)
                return st, acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        dt = timeit("full", full_loop, jax.jit(chain.init_state)(), wb_ri, mode)
        print(f"  -> {T/dt/1e9:.3f} Gsps wideband")

    if "pfb" in which:  # depthwise conv + DFT together (the op as shipped)
        def pfb_loop(state, wb_ri, n):
            wide = jax.lax.complex(wb_ri[0], wb_ri[1])

            def body(_, c):
                st, acc = c
                y, st = chain.pfb(st, wide[None, :])
                return st, acc + jnp.abs(y[0, 0, -1])

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        timeit("pfb+dft", pfb_loop, jax.jit(lambda: chain.pfb.init_state(1))(), wb_ri)

    if "demod" in which:
        def demod_loop(state, ch_ri, mode, n):
            chans = jax.lax.complex(ch_ri[0], ch_ri[1])
            cw = jnp.full((M,), chain.cw_tone_word, jnp.int32)

            def body(_, c):
                st, acc = c
                audio, st = demod_op.bank_apply(st, chans, mode, cw,
                                                cfg.fs_channel, cfg.nfm_deviation_hz)
                return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        timeit("demod bank", demod_loop, jax.jit(lambda: demod_op.bank_init(M))(), ch_ri, mode)

    if "agc" in which:
        def agc_loop(state, au, mode, n):
            def body(_, c):
                st, acc = c
                out, st, gain = chain.agc_bank.apply(st, au, mode)
                return st, acc + jnp.sum(jnp.abs(out[:, -1]))

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        timeit("agc bank", agc_loop, jax.jit(lambda: chain.agc_bank.init_state(M))(), au, mode)

    if "waterfall" in which:
        def wf_loop(state, wb_ri, n):
            wide = jax.lax.complex(wb_ri[0], wb_ri[1])

            def body(_, c):
                st, acc = c
                lines, st = chain.spectrum(st, wide[None, :])
                return st, acc + jnp.sum(lines[0][-1])

            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

        timeit("waterfall", wf_loop, jax.jit(lambda: chain.spectrum.init_state(1))(), wb_ri)


if __name__ == "__main__":
    main()
