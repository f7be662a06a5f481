"""Benchmark harness — prints ONE JSON line for the driver.

Metric: aggregate DDC+demod throughput in input IQ samples/s/chip through the
full RX block program (NCO -> CIC -> comp FIR -> OLS mode bank -> demod bank
-> AGC), the BASELINE.json north-star metric. vs_baseline is against the
10 Gsps / v5p-16 target prorated to one chip (625 Msps/chip).

Run on the real TPU (default platform); falls back to CPU if none.
Input blocks are pre-staged on device and state is donated — the benchmark
measures the compute path, not host I/O (SURVEY.md §7 hard-part #4).
"""

import json
import time

import jax

# remote (axon) compiles take minutes; persist them across bench runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from radioframe.core.config import CicStage, FirStage, RxConfig
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain

TARGET_PER_CHIP = 10e9 / 16  # BASELINE: >=10 Gsps aggregate on v5p-16


def _sync(x):
    """Axon-safe device sync: host-fetch a jitted f32 scalar."""
    return float(x)


def bench_adc_rate():
    """ADC-rate dataflow: 61.44 Msps -> 48 kHz (R=1280) per channel, the
    FPGA-equivalent full-rate DDC plan (core/presets.adc_61m44), fused
    NCO+CIC(32) front end. Returns input IQ samples/s/chip."""
    from radioframe.core import presets

    C, iters = 128, 16  # 128 channels -> full lane tile (C=8 wastes 94% of
    # the padded (Cp=128) kernel lanes: measured 0.59 vs 6.47 Gsps)
    cfg = presets.adc_61m44(channels=C, fuse_frontend=True, fuse_frontend_depth=2)
    chain = RxChain(cfg)
    T = chain.min_block  # 655360 input samples (R=1280 x hop 512)
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
    _sync(s)
    t0 = time.perf_counter()
    state, s = runj(state, iq_ri, words, mode, n=iters)
    _sync(s)
    dt = time.perf_counter() - t0
    return C * T * iters / dt, {"channels": C, "block_T": T, "decim": cfg.decim,
                                "iters": iters, "seconds": round(dt, 4)}


def bench_channelizer():
    """Config-5 dataflow: 61.44 Msps wideband -> 4096-channel PFB ->
    per-channel demod/AGC + waterfall. Returns wideband samples/s/chip."""
    from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig

    M, iters = 4096, 32
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, spectrum_nfft=4096)
    chain = ChannelizerChain(cfg)
    # big blocks amortize the dispatch floor: measured 84 Msps at
    # 4x min_block -> 694 Msps at 128x (1024 frames/channel, 32 MB block)
    T = 128 * chain.min_block
    rng = np.random.default_rng(2)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    mode = jnp.asarray(np.arange(M) % 4, jnp.int32)

    def run(state, wb_ri, mode, n):
        wide = jax.lax.complex(wb_ri[0], wb_ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, aux = chain.step(st, wide, mode)
            # touch every output so nothing is dead-code eliminated
            acc = acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])
            return st, acc

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(chain.init_state)()
    state, s = runj(state, wb_ri, mode, n=iters)
    _sync(s)
    t0 = time.perf_counter()
    state, s = runj(state, wb_ri, mode, n=iters)
    _sync(s)
    dt = time.perf_counter() - t0
    return T * iters / dt, {"channels": M, "block_T": T,
                            "iters": iters, "seconds": round(dt, 4)}


def main():
    C = 128          # channels (TPU lane width)
    blocks = 64      # timed iterations (one dispatch; amortizes the axon
                     # tunnel's ~20-30 ms execute round trip)
    cfg = RxConfig(
        fs_in=1_536_000.0,
        channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512,
        fuse_frontend=True,      # fused NCO+CIC(+comp FIR) Pallas front end
        fuse_frontend_depth=2,   # stage 2 consumed in-VMEM (fused_frontend2)
    )
    chain = RxChain(cfg)
    T = 8 * chain.min_block

    # AXON BACKEND CONSTRAINTS (probed): complex64 host<->device transfers and
    # op-by-op complex dispatch are UNIMPLEMENTED; block_until_ready doesn't
    # block. Therefore: f32-only I/O (re/im planes), complex state created
    # INSIDE jit, and sync via a jitted f32 scalar + host fetch.
    rng = np.random.default_rng(0)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run_blocks(state, iq_ri, words, mode, n):
        # all iterations inside ONE executable: the axon tunnel pays a
        # multi-second round trip per dispatch, so host-looped steps would
        # measure network latency, not the DDC
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, _ = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

        state, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return state, acc

    run = jax.jit(run_blocks, static_argnames="n", donate_argnums=0)
    init = jax.jit(lambda: chain.init_state(C))

    state = init()
    state, s = run(state, iq_ri, words, mode, n=blocks)  # compile + warm
    float(s)

    t0 = time.perf_counter()
    state, s = run(state, iq_ri, words, mode, n=blocks)
    float(s)
    dt = time.perf_counter() - t0

    samples = C * T * blocks  # channel-input IQ samples consumed
    rate = samples / dt
    dev = jax.devices()[0]
    detail = {
        "device": str(dev), "channels": C, "block_T": T, "decim": cfg.decim,
        "iters": blocks, "seconds": round(dt, 4),
    }
    # steady-state number at deeper dispatch amortization (the ~27 ms axon
    # tunnel round trip costs 0.43 ms/block at 64 iters, 0.11 at 256 —
    # production streaming runs persistent loops, so this is the honest
    # continuous-operation figure; the headline stays the 64-iter run)
    state, s = run(state, iq_ri, words, mode, n=4 * blocks)
    float(s)
    t0 = time.perf_counter()
    state, s = run(state, iq_ri, words, mode, n=4 * blocks)
    float(s)
    dt4 = time.perf_counter() - t0
    detail["steady_state_256iter"] = {
        "samples_per_s": round(C * T * 4 * blocks / dt4, 1),
        "seconds": round(dt4, 4)}
    # bench matrix (VERDICT r1 #4): the other two dataflows, logged in
    # detail so the driver-parsed flagship line stays the headline
    import os
    import traceback

    if not os.environ.get("RADIOFRAME_BENCH_FLAGSHIP_ONLY"):
        for name, fn in (("adc_rate_r1280", bench_adc_rate),
                         ("channelizer_4096", bench_channelizer)):
            try:
                r, info = fn()
                detail[name] = {"samples_per_s": round(r, 1), **info}
            except Exception:  # keep the flagship line alive no matter what
                detail[name] = {"error": traceback.format_exc(limit=1)}
    print(json.dumps({
        "metric": "ddc_chain_input_samples_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "IQ samples/s/chip",
        "vs_baseline": round(rate / TARGET_PER_CHIP, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
