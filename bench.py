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


def timed_median(once, n_runs: int = 3):
    """Median-of-N timing with the full spread recorded (VERDICT r4 #1).

    Best-of-2 could not bound the axon tunnel's run-to-run variance — the
    two timed runs inside BENCH_r04 differed by 20% and the official
    flagship number read as a 21% regression that the builder's own logs
    said was noise. The median of three is robust to one slow outlier,
    and every row records its min/median/max so any residual variance is
    visible in the artifact instead of silently deciding the headline.

    ``once`` runs one timed repetition and returns its wall seconds."""
    dts = sorted(once() for _ in range(n_runs))
    med = dts[n_runs // 2]
    return med, {"median_s": round(med, 4),
                 "runs_s": [round(x, 4) for x in dts]}


def bench_adc_rate():
    """ADC-rate dataflow: 61.44 Msps -> 48 kHz (R=1280) per channel, the
    FPGA-equivalent full-rate DDC plan (core/presets.adc_61m44), fused
    NCO+CIC(32) front end. Returns input IQ samples/s/chip."""
    from radioframe.core import presets

    C, iters = 128, 64  # 128 channels -> full lane tile (C=8 wastes 94% of
    # the padded (Cp=128) kernel lanes: measured 0.59 vs 6.47 Gsps);
    # 64 iters: the ~25 ms tunnel round trip is per dispatch (probe_floor)
    cfg = presets.adc_61m44(channels=C, fuse_frontend=True, fuse_frontend_depth=2,
                            enabled_modes=(0, 1, 2, 3))
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
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = runj(hold[0], iq_ri, words, mode, n=iters)
        hold[0] = st
        _sync(s)
        return time.perf_counter() - t0

    dt, spread = timed_median(once)
    return C * T * iters / dt, {"channels": C, "block_T": T, "decim": cfg.decim,
                                "iters": iters, **spread}


def bench_channelizer():
    """Config-5 dataflow: 61.44 Msps wideband -> 4096-channel PFB ->
    per-channel demod/AGC + waterfall. Returns wideband samples/s/chip.

    Round-5 formulation (ROADMAP round-5 log): the SINGLE-PASS kernel —
    polyphase + CT MXU DFT (manual bf16x3, TF-batched full-lane
    orientation) + demod bank + AGC + waterfall power in one VMEM pass
    (kernels/channelizer_one.py); the channel planes never touch HBM and
    the panorama rides the pass already paid. 7.67 -> 11.7 Gsps in r5
    (batched-MXU DFT orientation + 32 MB VMEM limit).
    iters=128: the ~25 ms axon round trip is per DISPATCH (not per
    iteration; tools/probe_floor.py), so 128 in-loop blocks cut the floor
    from 0.78 to 0.2 ms/block."""
    from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig

    M, iters = 4096, 256  # 256 in-loop blocks: the ~27 ms tunnel round
    # trip costs 0.11 ms/block here vs 0.21 at 128 — at the r4 kernel's
    # ~1.2 ms blocks that floor is no longer negligible (same steady-state
    # convention as the flagship headline)
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, waterfall_from_pfb=True,
                            waterfall_frame_avg=16, fuse_pfb=True,
                            fuse_demod=True,
                            # r4: ONE kernel for PFB+DFT+demod+AGC+waterfall
                            # (the channel planes never touch HBM) with
                            # manual-bf16x3 DFT matmuls (~2^-21 rel; full-
                            # chain delta vs f32 measured 5e-4 = -66 dBFS,
                            # asserted on-chip by tools/verify_tpu.py)
                            fuse_single_pass=True, dft_precision="b3",
                            # the bench population runs SSB/CW/AM/NFM; the
                            # static mode subset (a config choice, like the
                            # reference's mode menu) skips compiling SAM/LSB
                            enabled_modes=(0, 1, 2, 3))
    chain = ChannelizerChain(cfg)
    # big blocks amortize the dispatch floor: measured 84 Msps at
    # 4x min_block -> 694 Msps at 128x (1024 frames/channel, 32 MB block)
    T = 128 * chain.min_block
    rng = np.random.default_rng(2)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    mode = jnp.asarray(np.arange(M) % 4, jnp.int32)

    def run(state, wb_ri, mode, n):
        # complex entry measured FASTER than step_planes on slice-views of
        # one (2, T) buffer (5.80 vs 5.32 Gsps): the de-interleave is
        # loop-invariant (hoisted, paid once per 128 blocks) and yields
        # fresh contiguous planes for the kernel. step_planes remains the
        # right entry for genuinely separate I/Q plane buffers.
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
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = runj(hold[0], wb_ri, mode, n=iters)
        hold[0] = st
        _sync(s)
        return time.perf_counter() - t0

    dt, spread = timed_median(once)
    return T * iters / dt, {"channels": M, "block_T": T,
                            "iters": iters, **spread}


def bench_channelizer_sharded_d1(single_pass: bool = False,
                                 pod_form: bool = False):
    """Config-5 SHARDED formulations on a 1-device mesh: the acceptance
    shape runs ShardedChannelizer (collectives compile away at D=1), so
    these rows state each sharded formulation's single-chip cost next to
    the unsharded headline.

    single_pass=False: the TWO-kernel fused form (pfb_dft + per-shard
    demod_agc through the plane all_to_all) — the delta vs the unsharded
    `channelizer_4096` row is the interstage HBM round trip + plumbing.
    single_pass=True (r5, VERDICT r4 ask #1): the NO-all_to_all form.
    Since the r5 open-work-#4 follow-up, D=1 DEFERS to the unsharded
    chain (every cross-shard carry is block state at D=1), so this row
    should read ~= channelizer_4096 — it verifies the deferral, not the
    completion.
    pod_form=True (implies single_pass): force_general keeps the
    cross-shard formulation at D=1 AND disables AM statically, so the
    kernel emits its zero-entering release env and the completion is one
    elementwise max (the emit_env variant — the actual per-shard program
    a pod runs). This row prices that per-shard cost on one chip."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig
    from radioframe.shard.channelizer import ShardedChannelizer
    from radioframe.shard.mesh import place_state

    M, iters = 4096, 256  # steady-state convention (see bench_channelizer)
    single_pass = single_pass or pod_form
    en = (0, 1, 3) if pod_form else (0, 1, 2, 3)
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, waterfall_from_pfb=True,
                            waterfall_frame_avg=16, fuse_pfb=True,
                            fuse_demod=True, enabled_modes=en,
                            dft_precision="b3", fuse_single_pass=single_pass)
    chain = ChannelizerChain(cfg)
    mesh = jax.make_mesh((1,), ("dev",), devices=jax.devices()[:1])
    sch = ShardedChannelizer(chain, mesh, force_general=pod_form)
    if pod_form:
        assert sch.one_mode == "emit_env", sch.one_mode
    elif single_pass:
        assert sch.one_mode == "defer", sch.one_mode
    T = 128 * chain.min_block
    rng = np.random.default_rng(7)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    mode = jnp.asarray(np.array(en)[np.arange(M) % len(en)], jnp.int32)

    def run(state, wb_ri, mode, n):
        wide = jax.lax.complex(wb_ri[0], wb_ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, aux = sch.step(st, wide, mode)
            acc = acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])
            return st, acc

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = place_state(jax.jit(chain.init_state)(), sch.state_specs(), mesh)
    state, s = runj(state, wb_ri, mode, n=iters)
    _sync(s)
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = runj(hold[0], wb_ri, mode, n=iters)
        hold[0] = st
        _sync(s)
        return time.perf_counter() - t0

    dt, spread = timed_median(once)
    return T * iters / dt, {"channels": M, "block_T": T, "mesh_devices": 1,
                            "iters": iters, **spread}


def bench_tx():
    """DAC-rate DUC dataflow: 48 kHz audio -> 61.44 Msps IQ (L=1280) per
    channel via core/presets.tx_adc_61m44 — the adjoint of adc_61m44
    (SURVEY.md §2.1 #10, BASELINE config 4 TX half). Returns OUTPUT IQ
    samples/s/chip (the DAC-rate side, where the work is)."""
    from radioframe.core import presets
    from radioframe.pipelines.tx_chain import TxChain

    C, iters = 64, 32  # floor is per dispatch (probe_floor): ~0.8 ms/iter
    cfg = presets.tx_adc_61m44(channels=C)
    chain = TxChain(cfg)
    Ta = chain.min_block  # 512 audio samples -> 655360 IQ out per channel
    L = cfg.interp
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((C, Ta)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-20e6, 20e6, C), cfg.fs_out))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run(state, audio, words, mode, n):
        def body(_, carry):
            st, acc = carry
            st, iq = chain.step(st, audio, words, mode)
            return st, acc + jnp.sum(jnp.abs(iq[:, -1]))

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, audio, words, mode, n=iters)
    _sync(s)
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = runj(hold[0], audio, words, mode, n=iters)
        hold[0] = st
        _sync(s)
        return time.perf_counter() - t0

    dt, spread = timed_median(once)
    return C * Ta * L * iters / dt, {"channels": C, "audio_T": Ta, "interp": L,
                                     "iters": iters, **spread}


def bench_duplex():
    """Config-4 dataflow: RX DDC + TX DUC in ONE jitted program (full duplex).
    RX: 1.536 Msps -> 48 kHz (R=32) per channel; TX: the exact adjoint
    (48 kHz -> 1.536 Msps, FIR(4) + CIC(8, N=4)). Returns RX input IQ
    samples/s/chip (TX emits the same rate out, simultaneously)."""
    from radioframe.pipelines.duplex import DuplexChain

    C, iters = 128, 64
    rx_cfg = RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512, fuse_frontend=True, fuse_frontend_depth=2,
        enabled_modes=(0, 1, 2, 3))
    from radioframe.core.config import TxConfig

    tx_cfg = TxConfig(fs_out=1_536_000.0, channels=C,
                      interp_stages=(4, CicStage(R=8, N=4)))
    duplex = DuplexChain(rx_cfg, tx_cfg)
    T = 8 * duplex.rx.min_block
    Ta = T // rx_cfg.decim
    rng = np.random.default_rng(4)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((C, Ta)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), rx_cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run(state, iq_ri, audio, words, mode, n):
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])

        def body(_, carry):
            st, acc = carry
            st, rx_audio, tx_iq, _ = duplex.step(st, iq, audio, words, mode, words, mode)
            return st, acc + jnp.sum(jnp.abs(rx_audio[:, -1])) + jnp.sum(jnp.abs(tx_iq[:, -1]))

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: duplex.init_state(C))()
    state, s = runj(state, iq_ri, audio, words, mode, n=iters)
    _sync(s)
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = runj(hold[0], iq_ri, audio, words, mode, n=iters)
        hold[0] = st
        _sync(s)
        return time.perf_counter() - t0

    dt, spread = timed_median(once)
    return C * T * iters / dt, {"channels": C, "block_T": T, "rx_decim": rx_cfg.decim,
                                "tx_interp": tx_cfg.interp, "iters": iters,
                                **spread}


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
        enabled_modes=(0, 1, 2, 3),  # bench population is SSB/CW/AM/NFM
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

    dev = jax.devices()[0]
    detail = {
        "device": str(dev), "channels": C, "block_T": T, "decim": cfg.decim,
    }
    # raw 64-iter figure (kept for continuity with BENCH_r01/r02 headlines;
    # its ~27 ms axon-tunnel round trip is ~25% of the run, so its variance
    # swamps real chain changes — that is why it is NOT the headline)
    detail["raw_64iter"] = {"samples_per_s": round(C * T * blocks / dt, 1),
                            "iters": blocks, "seconds": round(dt, 4)}
    # HEADLINE: steady-state (256-iter) throughput, MEDIAN of three runs
    # with the spread recorded (VERDICT r4 #1: best-of-2 min over adjacent
    # runs did not bound the axon tunnel's variance — BENCH_r04's two runs
    # differed 20% and the official number read as a noise regression; the
    # median is outlier-robust and the runs_s list makes the spread part of
    # the artifact). At 256 iters the tunnel round trip costs 0.11 ms/block;
    # production streaming runs persistent loops, so this is the honest
    # continuous-operation figure.
    state, s = run(state, iq_ri, words, mode, n=4 * blocks)  # re-warm
    float(s)
    hold = [state]

    def once():
        t0 = time.perf_counter()
        st, s = run(hold[0], iq_ri, words, mode, n=4 * blocks)
        hold[0] = st
        float(s)
        return time.perf_counter() - t0

    dt4, spread = timed_median(once, n_runs=5)  # flagship: n=5, it IS the
    # driver-parsed value and each run is only ~0.3 s
    rate = C * T * 4 * blocks / dt4
    detail["steady_state_256iter"] = {
        "samples_per_s": round(rate, 1), **spread}
    # bench matrix (VERDICT r1 #4, r2 #4): the other four dataflows, logged
    # in detail so the driver-parsed flagship line stays the headline
    import os
    import traceback

    if not os.environ.get("RADIOFRAME_BENCH_FLAGSHIP_ONLY"):
        for name, fn in (("adc_rate_r1280", bench_adc_rate),
                         ("channelizer_4096", bench_channelizer),
                         ("channelizer_sharded_d1", bench_channelizer_sharded_d1),
                         ("channelizer_sharded_one_d1",
                          lambda: bench_channelizer_sharded_d1(single_pass=True)),
                         ("channelizer_sharded_one_pod",
                          lambda: bench_channelizer_sharded_d1(pod_form=True)),
                         ("tx_adc_r1280", bench_tx),
                         ("duplex", bench_duplex)):
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
