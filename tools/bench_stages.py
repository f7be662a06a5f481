"""Per-stage timing of the bench.py RX chain on the real TPU.

Times each chain stage in isolation — NCO mix, CIC decim, FIR decim, OLS
mode bank, demod+AGC — plus the full chain and an empty-dispatch floor, to
find the real bottleneck (ROADMAP open perf work #1).

Axon-tunnel rules honored (see bench.py / ROADMAP): f32-only host I/O,
complex built inside jit, sync via jitted f32 scalar + float(), all timed
iterations inside ONE executable (lax.fori_loop) with state threaded so
nothing gets hoisted out of the loop.

Usage: python tools/bench_stages.py [--iters 64]
"""

import argparse
import json
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
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain


def timed(name, fn, init_fn, args, iters, results):
    """fn(state, *args) -> (state, f32 scalar); loop it inside one jit.

    init_fn is jitted: axon cannot create complex arrays op-by-op (ROADMAP).
    """
    state = jax.jit(init_fn)()

    def run(state, args, n):
        def body(_, carry):
            st, acc = carry
            st, s = fn(st, *args)
            return st, acc + s
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    t0 = time.perf_counter()
    state2, s = runj(state, args, n=iters)
    float(s)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state2, s = runj(state2, args, n=iters)
    float(s)
    dt = time.perf_counter() - t0
    per_iter_ms = dt / iters * 1e3
    results.append({"stage": name, "ms_per_block": round(per_iter_ms, 4),
                    "total_s": round(dt, 4), "compile_s": round(compile_s, 1)})
    print(f"{name:14s} {per_iter_ms:9.4f} ms/block  (compile {compile_s:.1f}s)",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    args_ns = ap.parse_args()
    iters = args_ns.iters

    C = 128
    cfg = RxConfig(
        fs_in=1_536_000.0,
        channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512,
    )
    chain = RxChain(cfg)
    # the BENCH config (fused v2 front end + static mode subset) for the
    # full-chain row — the unfused `chain` above isolates the XLA stages,
    # but the full-chain number must measure what bench.py actually ships
    # (r4 fix: the old full_chain row probed the unfused chain, 2.44 vs
    # the real 0.84 ms/block, which skewed the r2-era SoL table)
    bench_chain = RxChain(RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512, fuse_frontend=True, fuse_frontend_depth=2,
        enabled_modes=(0, 1, 2, 3)))
    T = 8 * chain.min_block
    print(f"device={jax.devices()[0]} C={C} T={T} iters={iters}", flush=True)

    rng = np.random.default_rng(0)
    x_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    T8 = T // 8
    x8_ri = jnp.asarray(rng.standard_normal((2, C, T8)).astype(np.float32))
    Ta = T // cfg.decim
    xa_ri = jnp.asarray(rng.standard_normal((2, C, Ta)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
    cw_word = jnp.full((C,), int(nco.freq_word(cfg.cw_tone_hz, cfg.fs_audio)), jnp.int32)

    results = []

    # dispatch floor: trivial state-threaded loop
    def floor_fn(st, x):
        return st + 1.0, jnp.sum(x[0, 0, :8]) + st
    timed("floor", floor_fn, lambda: jnp.float32(0.0), (x_ri,), iters, results)

    # NCO mix at full rate
    def nco_fn(acc, x_ri, words):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        y, acc = nco.mix_down(x, words, acc)
        return acc, jnp.sum(jnp.abs(y[:, -1]))
    timed("nco_mix", nco_fn, lambda: nco.init_state(C), (x_ri, words), iters, results)

    # CIC stage at full rate
    cic = chain.decimators[0]
    def cic_fn(tail, x_ri):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        y, tail = cic(tail, x)
        return tail, jnp.sum(jnp.abs(y[:, -1]))
    timed("cic_r8", cic_fn, lambda: cic.init_state(C), (x_ri,), iters, results)

    # FIR stage at fs/8
    fir = chain.decimators[1]
    def fir_fn(tail, x_ri):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        y, tail = fir(tail, x)
        return tail, jnp.sum(jnp.abs(y[:, -1]))
    timed("fir_r4", fir_fn, lambda: fir.init_state(C), (x8_ri,), iters, results)

    # OLS mode filter bank at audio rate
    bank = chain.mode_bank
    def ols_fn(st, x_ri):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        filt, st = bank(st, x)
        return st, jnp.sum(jnp.abs(filt[:, :, -1]))
    timed("ols_bank", ols_fn, lambda: bank.init_state(C), (xa_ri,), iters, results)

    # OLS with frequency-domain per-channel filter select (the shipped hot
    # path: one forward + one inverse FFT instead of K)
    fidx = demod_op.filter_index(mode)

    def ols_sel_fn(st, x_ri, fidx):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        sel, st = bank.apply_selected(st, x, fidx)
        return st, jnp.sum(jnp.abs(sel[:, -1]))
    timed("ols_selected", ols_sel_fn, lambda: bank.init_state(C), (xa_ri, fidx),
          iters, results)

    # demod bank + AGC at audio rate
    def dem_fn(st, x_ri, mode, cw_word):
        demod_state, agc_env = st
        x = jax.lax.complex(x_ri[0], x_ri[1])
        audio, demod_state = demod_op.bank_apply(
            demod_state, x, mode, cw_word, cfg.fs_audio, cfg.nfm_deviation_hz)
        agc_audio, agc_env, _ = chain.agc_bank.apply(agc_env, audio, mode)
        return (demod_state, agc_env), jnp.sum(jnp.abs(agc_audio[:, -1]))
    timed("demod_agc", dem_fn, lambda: (demod_op.bank_init(C), chain.agc_bank.init_state(C)),
          (xa_ri, mode, cw_word), iters, results)

    # demod bank alone (audio rate)
    def demod_only_fn(st, x_ri, mode, cw_word):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        audio, st = demod_op.bank_apply(
            st, x, mode, cw_word, cfg.fs_audio, cfg.nfm_deviation_hz)
        return st, jnp.sum(jnp.abs(audio[:, -1]))
    timed("demod_only", demod_only_fn, lambda: demod_op.bank_init(C),
          (xa_ri, mode, cw_word), iters, results)

    # AGC scan alone (audio rate, real input)
    def agc_fn(st, x_ri, mode):
        y, st, _ = chain.agc_bank.apply(st, x_ri[0], mode)
        return st, jnp.sum(jnp.abs(y[:, -1]))
    timed("agc_only", agc_fn, lambda: chain.agc_bank.init_state(C), (xa_ri, mode), iters, results)

    # fused NCO+CIC front end (kernels/fused_frontend.py) at full rate
    from radioframe.kernels.fused_frontend import FusedFrontend
    from radioframe.ops.filter_design import cic_equivalent_taps

    fus = FusedFrontend(cic_equivalent_taps(8, 4, 1), 8)
    def fused_fn(st, x_ri, words):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        st, y = fus.step(st, x, words)
        return st, jnp.sum(jnp.abs(y[:, -1]))
    timed("fused_nco_cic", fused_fn, lambda: fus.init_state(C),
          (x_ri, words), iters, results)

    # full chain, UNFUSED (stage-isolation reference)
    def full_fn(st, x_ri, words, mode):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        st, audio, _ = chain.step(st, x, words, mode)
        return st, jnp.sum(jnp.abs(audio[:, -1]))
    timed("full_chain_unfused", full_fn, lambda: chain.init_state(C),
          (x_ri, words, mode), iters, results)

    # full chain, the SHIPPED bench config (fused v2 + mode subset)
    def bench_fn(st, x_ri, words, mode):
        x = jax.lax.complex(x_ri[0], x_ri[1])
        st, audio, _ = bench_chain.step(st, x, words, mode)
        return st, jnp.sum(jnp.abs(audio[:, -1]))
    timed("full_chain", bench_fn, lambda: bench_chain.init_state(C),
          (x_ri, words, mode), iters, results)

    floor = results[0]["ms_per_block"]
    total = results[-1]["ms_per_block"]
    # stage rows exclude the floor row AND both full-chain rows (r4 fix:
    # full_chain_unfused must not count as a "stage" in the sum)
    stages = results[1:-2]
    print(json.dumps({"results": results, "floor_ms": floor,
                      "stage_sum_minus_floor_ms": round(
                          sum(r["ms_per_block"] for r in stages)
                          - floor * len(stages), 4),
                      "full_minus_floor_ms": round(total - floor, 4)}))


if __name__ == "__main__":
    main()
