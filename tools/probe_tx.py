"""TX chain stage probe (tx_adc_61m44, C=64): where do 13.8 ms/iter go?"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from radioframe.core import presets
from radioframe.ops import nco
from radioframe.pipelines.tx_chain import TxChain

C, ITERS = 64, 32
cfg = presets.tx_adc_61m44(channels=C)
chain = TxChain(cfg)
Ta = chain.min_block
rng = np.random.default_rng(3)
audio = jnp.asarray(rng.standard_normal((C, Ta)).astype(np.float32))
words = jnp.asarray(nco.freq_word(np.linspace(-20e6, 20e6, C), cfg.fs_out))
mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
T_out = Ta * cfg.interp


def timed(name, fn, *args):
    f = jax.jit(fn, static_argnames="n")
    s = f(*args, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    s = f(*args, n=ITERS)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:8.3f} ms/iter  ({C*T_out/dt/1e9:6.2f} G out-samples/s)")


def run_full(audio, words, mode, n):
    def body(_, carry):
        st, acc = carry
        st, iq = chain.step(st, audio, words, mode)
        return st, acc + jnp.sum(jnp.abs(iq[:, -1]))

    return lax.fori_loop(0, n, body, (jax.jit(lambda: chain.init_state(C))(),
                                      jnp.float32(0.0)))[1]


def run_interp_k(k):
    """Just the first k interpolation stages, fed a baseband block."""
    def run(audio, n):
        x0 = audio.astype(jnp.complex64)
        sts0 = tuple(ip.init_state(C) for ip in chain.interps[:k])

        def body(_, carry):
            sts, acc = carry
            x = x0 * (1.0 + acc * 1e-20)  # defeat LICM
            new = []
            for ip, st in zip(chain.interps[:k], sts):
                x, st = ip(st, x)
                new.append(st)
            return tuple(new), acc + jnp.abs(x[-1, -1])

        return lax.fori_loop(0, n, body, (sts0, jnp.float32(0.0)))[1]

    return run


def run_nco_only(audio, n):
    """Final mix at DAC rate only (655360 per channel)."""
    x0 = jnp.broadcast_to(audio, (C, Ta))
    big = jnp.zeros((C, T_out), jnp.complex64) + x0[:, :1]

    def body(_, carry):
        ph, acc = carry
        y, ph = nco.mix_up(big * (1.0 + acc * 1e-20), words, ph)
        return ph, acc + jnp.abs(y[-1, -1])

    return lax.fori_loop(0, n, body, (nco.init_state(C), jnp.float32(0.0)))[1]


timed("tx_full", run_full, audio, words, mode)
timed("interp_fir5", run_interp_k(1), audio)
timed("interp_fir5_fir8", run_interp_k(2), audio)
timed("interp_all3", run_interp_k(3), audio)
timed("nco_mix_at_dac_rate", run_nco_only, audio)
