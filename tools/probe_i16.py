"""Real-TPU probe: int16 ADC ingest vs f32 planes through the fused v2 chain.

The fused front end is HBM-read bound (ROADMAP roofline table: the kernel is
pure data movement). int16 planes halve the bytes the full-rate stream needs
to cross HBM, so the kernel bound doubles. This measures the whole chain
both ways at the flagship config.

Usage: python tools/probe_i16.py [i16|f32] (default: both)
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

from radioframe.core.config import CicStage, FirStage, RxConfig
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain

C, ITERS = 128, 64


def base_cfg(**kw):
    return RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512, fuse_frontend=True, fuse_frontend_depth=2, **kw)


def run_f32():
    chain = RxChain(base_cfg())
    T = 8 * chain.min_block
    rng = np.random.default_rng(0)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), chain.cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def loop(state, iq_ri, words, mode, n):
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])

        def body(_, c):
            st, acc = c
            st, audio, _ = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    runj = jax.jit(loop, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, iq_ri, words, mode, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    state, s = runj(state, iq_ri, words, mode, n=ITERS)
    float(s)
    dt = time.perf_counter() - t0
    print(f"f32 planes: {C*T*ITERS/dt/1e9:.2f} Gsps ({dt/ITERS*1e3:.3f} ms/block)")


def run_i16():
    chain = RxChain(base_cfg(int16_ingest=True))
    T = 8 * chain.min_block
    rng = np.random.default_rng(0)
    xr = jnp.asarray((rng.standard_normal((C, T)) * 8192).astype(np.int16))
    xi = jnp.asarray((rng.standard_normal((C, T)) * 8192).astype(np.int16))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), chain.cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def loop(state, xr, xi, words, mode, n):
        def body(_, c):
            st, acc = c
            st, audio, _ = chain.step_i16(st, xr, xi, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    runj = jax.jit(loop, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, xr, xi, words, mode, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    state, s = runj(state, xr, xi, words, mode, n=ITERS)
    float(s)
    dt = time.perf_counter() - t0
    print(f"i16 planes: {C*T*ITERS/dt/1e9:.2f} Gsps ({dt/ITERS*1e3:.3f} ms/block)")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"i16", "f32"}
    if "f32" in which:
        run_f32()
    if "i16" in which:
        run_i16()
