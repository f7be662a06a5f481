"""One-off TPU experiments: ADC-rate chain after the fused-kernel grid cap,
and channelizer block-size scaling. Not part of the driver bench."""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from radioframe.core import presets
from radioframe.ops import nco
from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig
from radioframe.pipelines.rx_chain import RxChain


def adc_rate(C=8, iters=8):
    cfg = presets.adc_61m44(channels=C, fuse_frontend=True)
    chain = RxChain(cfg)
    T = chain.min_block
    rng = np.random.default_rng(1)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-20e6, 20e6, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run(state, iq_ri, words, mode, n):
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])
        def body(_, carry):
            st, acc = carry
            st, audio, _ = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, iq_ri, words, mode, n=iters)
    float(s)
    t0 = time.perf_counter()
    state, s = runj(state, iq_ri, words, mode, n=iters)
    float(s)
    dt = time.perf_counter() - t0
    print(f"adc_rate C={C} T={T} iters={iters}: {C*T*iters/dt/1e9:.2f} Gsps "
          f"({dt*1e3/iters:.2f} ms/block)")


def channelizer(mult, iters=16):
    M = 4096
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, spectrum_nfft=4096)
    chain = ChannelizerChain(cfg)
    T = mult * chain.min_block
    rng = np.random.default_rng(2)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    mode = jnp.asarray(np.arange(M) % 4, jnp.int32)

    def run(state, wb_ri, mode, n):
        wide = jax.lax.complex(wb_ri[0], wb_ri[1])
        def body(_, carry):
            st, acc = carry
            st, audio, aux = chain.step(st, wide, mode)
            acc = acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])
            return st, acc
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(chain.init_state)()
    state, s = runj(state, wb_ri, mode, n=iters)
    float(s)
    t0 = time.perf_counter()
    state, s = runj(state, wb_ri, mode, n=iters)
    float(s)
    dt = time.perf_counter() - t0
    print(f"channelizer M={M} T={T} (x{mult}) iters={iters}: "
          f"{T*iters/dt/1e6:.1f} Msps wideband ({dt*1e3/iters:.2f} ms/block)")


def overlap_overhead(C=128, iters=64):
    """Single-chip cost of the RDMA-overlap split (zero-tail interior +
    boundary_correction) vs the combined fused step, flagship shapes."""
    from radioframe.kernels.fused_frontend import FusedFrontend
    from radioframe.ops.filter_design import cic_equivalent_taps

    fus = FusedFrontend(cic_equivalent_taps(8, 4, 1), 8)
    T = 131072
    rng = np.random.default_rng(3)
    x_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    t_ri = jnp.asarray(rng.standard_normal((2, C, fus.H)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), 1_536_000.0))

    def run_combined(acc, x_ri, t_ri, words, n):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        tail = jax.lax.complex(t_ri[0], t_ri[1])
        def body(_, carry):
            acc_, s = carry
            st, y = fus.step({"acc": acc_, "tail": tail}, x, words)
            return st["acc"], s + jnp.sum(jnp.abs(y[:, -1]))
        return jax.lax.fori_loop(0, n, body, (acc, jnp.float32(0.0)))

    def run_split(acc, x_ri, t_ri, words, n):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        tail = jax.lax.complex(t_ri[0], t_ri[1])
        zero = jnp.zeros_like(tail)
        def body(_, carry):
            acc_, s = carry
            st, y = fus.step({"acc": acc_, "tail": zero}, x, words)
            corr = fus.boundary_correction(acc_, words, tail)
            y = y.at[:, : fus.J0].add(corr)
            return st["acc"], s + jnp.sum(jnp.abs(y[:, -1]))
        return jax.lax.fori_loop(0, n, body, (acc, jnp.float32(0.0)))

    for name, fn in (("combined", run_combined), ("split", run_split)):
        f = jax.jit(fn, static_argnames="n")
        acc = jnp.zeros((C,), jnp.int32)
        _, s = f(acc, x_ri, t_ri, words, n=iters)
        float(s)
        t0 = time.perf_counter()
        _, s = f(acc, x_ri, t_ri, words, n=iters)
        float(s)
        dt = time.perf_counter() - t0
        print(f"overlap_overhead {name}: {dt*1e3/iters:.3f} ms/block")


def flagship(iters=64, fuse=True, C=128):
    from radioframe.core.config import CicStage, FirStage, RxConfig

    cfg = RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512, fuse_frontend=fuse)
    chain = RxChain(cfg)
    T = 8 * chain.min_block
    rng = np.random.default_rng(0)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run(state, iq_ri, words, mode, n):
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])
        def body(_, carry):
            st, acc = carry
            st, audio, _ = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, iq_ri, words, mode, n=iters)
    float(s)
    t0 = time.perf_counter()
    state, s = runj(state, iq_ri, words, mode, n=iters)
    float(s)
    dt = time.perf_counter() - t0
    print(f"flagship fuse={fuse} iters={iters}: {C*T*iters/dt/1e9:.2f} Gsps "
          f"({dt*1e3/iters:.3f} ms/block)")


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("adc", "all"):
        for C in (64, 128):
            adc_rate(C=C, iters=4)
    if which in ("chan", "all"):
        for mult in (64, 128):
            channelizer(mult, iters=8)
    if which in ("overlap", "all"):
        overlap_overhead()
    if which == "flagship":
        flagship(64)
        flagship(256)
        flagship(64, fuse=False)
