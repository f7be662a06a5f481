"""Time the REAL ChannelizerChain piecewise at bench shapes (iters=128,
floor ~0.2 ms/iter) to find the gap between stage-sum and chain time."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from radioframe.core.config import AgcConfig
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.pipelines.channelizer import (ChannelizerChain,
                                              ChannelizerConfig,
                                              pfb_waterfall_lines)

M, ITERS = 4096, 128
cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                        emit_spectrum=True, waterfall_from_pfb=True,
                        waterfall_frame_avg=16, fuse_pfb=True,
                        enabled_modes=(0, 1, 2, 3))
chain = ChannelizerChain(cfg)
T = 128 * chain.min_block
F = T // M
rng = np.random.default_rng(2)
wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
cw_word = jnp.full((M,), chain.cw_tone_word, jnp.int32)


def timed(name, fn, *args):
    f = jax.jit(fn, static_argnames="n")
    s = f(*args, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    s = f(*args, n=ITERS)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.3f} ms/block   ({T/dt/1e9:6.2f} Gsps wideband)")
    return dt


def run_full(wb_ri, mode, n):
    wide = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        st, acc = carry
        st, audio, aux = chain.step(st, wide, mode)
        return st, acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])

    return lax.fori_loop(0, n, body, (jax.jit(chain.init_state)(), jnp.float32(0.0)))[1]


def run_pfb_only(wb_ri, n):
    wide = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        tail, acc = carry
        chans, tail = chain.pfb(tail, wide[None, :])
        return tail, acc + jnp.abs(chans[0, -1, -1])

    return lax.fori_loop(0, n, body, (chain.pfb.init_state(1), jnp.float32(0.0)))[1]


def run_pfb_demod(wb_ri, mode, n):
    wide = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        tail, dstate, acc = carry
        chans, tail = chain.pfb(tail, wide[None, :])
        audio, dstate = demod_op.bank_apply(dstate, chans[0], mode, cw_word,
                                            cfg.fs_channel, cfg.nfm_deviation_hz)
        return tail, dstate, acc + jnp.abs(audio[-1, -1])

    return lax.fori_loop(0, n, body, (chain.pfb.init_state(1),
                                      demod_op.bank_init(M), jnp.float32(0.0)))[2]


def run_pfb_demod_agc(wb_ri, mode, n):
    wide = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        tail, dstate, astate, acc = carry
        chans, tail = chain.pfb(tail, wide[None, :])
        audio, dstate = demod_op.bank_apply(dstate, chans[0], mode, cw_word,
                                            cfg.fs_channel, cfg.nfm_deviation_hz)
        agc_audio, astate, gain = chain.agc_bank.apply(astate, audio, mode)
        audio = jnp.where((mode == demod_op.NFM)[:, None], audio, agc_audio)
        return tail, dstate, astate, acc + jnp.abs(audio[-1, -1])

    return lax.fori_loop(0, n, body, (chain.pfb.init_state(1), demod_op.bank_init(M),
                                      chain.agc_bank.init_state(M), jnp.float32(0.0)))[3]


timed("chain_full", run_full, wb_ri, mode)
timed("pfb_only", run_pfb_only, wb_ri)
timed("pfb_demod", run_pfb_demod, wb_ri, mode)
timed("pfb_demod_agc", run_pfb_demod_agc, wb_ri, mode)
