"""Mode-grouping lever measurement (VERDICT r4 ask #4).

The single-pass channelizer's demod stage computes EVERY statically
enabled mode branch for every channel and mask-selects (runtime retune
without recompile — a design principle). A mode-grouped formulation
(host-side stable sort of channels by mode at retune, one demod path per
tile group, unsort at the API boundary) would cut per-sample demod work to
the per-mode mean. This probe prices that lever WITHOUT building it:

  t(enabled = {m}) for each single mode m   -> per-mode full-block cost
  t(enabled = ())                           -> shared PFB+DFT+AGC+wf floor
  t(enabled = all four)                     -> today's shipped cost

Projected mode-grouped cost (uniform mode population, linear per-channel
scaling of the demod branches):

  t_grouped ~= t_floor + mean_m (t_m - t_floor)

Compare against the r4 attribution (~40 VPU ops/sample) and decide: ship
the grouped formulation or write the irreducibility roofline (ROADMAP r5).

Run ON THE TPU: python tools/probe_modegroup.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig

M, ITERS = 4096, 256
NAMES = {(): "none (PFB+DFT+AGC+wf floor)", (0,): "ssb only", (1,): "cw only",
         (2,): "am only", (3,): "nfm only", (0, 1, 2, 3): "all four (shipped)"}


def bench(enabled):
    cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                            emit_spectrum=True, waterfall_from_pfb=True,
                            waterfall_frame_avg=16, fuse_pfb=True,
                            fuse_demod=True, fuse_single_pass=True,
                            dft_precision="b3", enabled_modes=enabled)
    chain = ChannelizerChain(cfg)
    T = 128 * chain.min_block
    rng = np.random.default_rng(2)
    wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    # every channel in an enabled mode (mask-select keeps the branch live);
    # empty set -> mode 0 everywhere (all branches compiled out)
    pop = np.asarray(enabled, np.int32) if enabled else np.zeros(1, np.int32)
    mode = jnp.asarray(pop[np.arange(M) % len(pop)], jnp.int32)

    def run(state, wb_ri, mode, n):
        wide = jax.lax.complex(wb_ri[0], wb_ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, aux = chain.step(st, wide, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1])) + jnp.sum(aux["waterfall"][-1])

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(chain.init_state)()
    state, s = runj(state, wb_ri, mode, n=ITERS)
    float(s)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, s = runj(state, wb_ri, mode, n=ITERS)
        float(s)
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    ms_block = dt / ITERS * 1e3
    gsps = T * ITERS / dt / 1e9
    print(f"{NAMES[enabled]:34s} {ms_block:7.3f} ms/block  {gsps:6.2f} Gsps "
          f"(runs {[round(x, 4) for x in sorted(dts)]})", flush=True)
    return ms_block


def bench_kernel(apply_agc: bool, enabled=(), wf_avg=16, label=""):
    """Bare FusedChannelizerOne loop (no chain plumbing): isolates the
    kernel's floor stages. apply_agc=False + enabled=() = PFB + DFT +
    waterfall/power only."""
    from radioframe.kernels.channelizer_one import FusedChannelizerOne

    kern = FusedChannelizerOne(M, 8, 61_440_000.0 / M, 2500.0, wf_avg=wf_avg,
                               enabled=enabled, dft_precision="b3",
                               apply_agc=apply_agc)
    F = 2048
    T = F * M
    rng = np.random.default_rng(3)
    wb = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    mode = jnp.zeros((M,), jnp.int32)
    cw = jnp.full((M,), 123456, jnp.int32)
    ones = jnp.ones((M,), jnp.float32)

    def run(st, tl, wb, n):
        def body(_, carry):
            st, tl, acc = carry
            audio, pw, wf, st = kern.call_planes(
                tl, wb[0], wb[1], mode, cw, jnp.zeros((M,), jnp.int32),
                ones * 0.9999, ones * 0.0, ones, ones * 100.0, st)
            tl = jax.lax.complex(wb[0, T - (kern.K - 1) * M:],
                                 wb[1, T - (kern.K - 1) * M:])[None]
            return st, tl, acc + jnp.sum(jnp.abs(audio[-1])) + jnp.sum(wf[-1])
        return jax.lax.fori_loop(0, n, body, (st, tl, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=(0, 1))
    st = jnp.zeros((7, M), jnp.float32)
    tl = jax.jit(kern.init_tail)()
    st, tl, s = runj(st, tl, wb, n=ITERS)
    float(s)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        st, tl, s = runj(st, tl, wb, n=ITERS)
        float(s)
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    ms = dt / ITERS * 1e3
    print(f"{label:34s} {ms:7.3f} ms/block  {T * ITERS / dt / 1e9:6.2f} Gsps "
          f"(runs {[round(x, 4) for x in sorted(dts)]})", flush=True)
    return ms


def bench_pfb_only():
    """Bare FusedPfbDft (b3): the PFB+DFT stages with NO demod/AGC/wf at
    all — anchors the floor decomposition."""
    from radioframe.kernels.pfb_dft import FusedPfbDft

    kern = FusedPfbDft(M, 8, dft_precision="b3")
    F = 2048
    T = F * M
    rng = np.random.default_rng(3)
    wb = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))

    def run(tl, wb, n):
        def body(_, carry):
            tl, acc = carry
            x = jax.lax.complex(wb[0], wb[1])[None]
            (yr, yi), tl = kern.call_planes(tl, x, native=True)
            return tl, acc + jnp.sum(jnp.abs(yr[-1])) + jnp.sum(jnp.abs(yi[-1]))
        return jax.lax.fori_loop(0, n, body, (tl, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    tl = jax.jit(lambda: kern.init_state(1))()
    tl, s = runj(tl, wb, n=ITERS)
    float(s)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        tl, s = runj(tl, wb, n=ITERS)
        float(s)
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    ms = dt / ITERS * 1e3
    print(f"{'pfb_dft kernel alone (b3)':34s} {ms:7.3f} ms/block  "
          f"{T * ITERS / dt / 1e9:6.2f} Gsps "
          f"(runs {[round(x, 4) for x in sorted(dts)]})", flush=True)
    return ms


def main():
    print(f"single-pass channelizer, M={M}, per-enabled-set timings:")
    floor = bench(())
    per_mode = {m: bench((m,)) for m in (0, 1, 2, 3)}
    shipped = bench((0, 1, 2, 3))
    grouped = floor + np.mean([per_mode[m] - floor for m in per_mode])
    print(f"\nfloor {floor:.3f} ms; shipped {shipped:.3f} ms; "
          f"projected mode-grouped {grouped:.3f} ms "
          f"({8388608 / grouped / 1e6:.2f} Gsps)")
    print("demod-branch increments over floor: "
          + ", ".join(f"{NAMES[(m,)].split()[0]} +{per_mode[m] - floor:.3f}"
                      for m in per_mode))
    print("\nfloor decomposition (bare kernel loops):")
    t_pfb = bench_pfb_only()
    t_noagc = bench_kernel(False, (), label="one-kernel: pfb+dft+wf, NO agc")
    t_agc = bench_kernel(True, (), label="one-kernel: pfb+dft+wf+agc")
    print(f"\nincrements over bare pfb_dft: +wf/power/plumbing "
          f"{t_noagc - t_pfb:.3f} | +agc {t_agc - t_noagc:.3f} ms")


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
