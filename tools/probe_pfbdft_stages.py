"""PFB+DFT kernel stage decomposition + MXU-orientation experiments.

probe_modegroup (r5) showed the single-pass channelizer's cost is ~95%
the PFB+DFT stage itself (bare pfb_dft kernel 1.071 ms/block vs 1.098
shipped; demod+AGC+wf together ~0.1 ms) — so the speed-of-light hunt
(VERDICT r4 ask #4, BASELINE "kernels at speed-of-light") must decompose
THIS kernel. Experimental variants, all timed on the real chip:

  pfb_only    polyphase accumulate only (no DFT) — prices the K-tap
              shifted-slice loop over VMEM history
  dft_only    CT DFT of the raw tile (no polyphase/history concat)
  base_b3     the shipped formulation (manual bf16x3 CT)
  batched_b3  stage-1 reoriented: the shipped form contracts
              (TF*n2, n1=32) x (n1, k1=32) — 32 output columns waste 3/4
              of the MXU lanes. Here stage 1 runs as a TF-BATCHED
              (k1, n1) x (n1, n2) matmul producing (TF, k1, n2): output
              lanes n2=128 (full), twiddle applied in that layout, and
              stage 2 contracts the MINOR axis n2=128 at full depth into
              native (TF, k1, k2) — no relayout anywhere.

Run ON THE TPU: python tools/probe_pfbdft_stages.py
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radioframe.kernels.pfb_dft import _bf16_split, _dft_consts, _mm_p
from radioframe.ops.filter_design import pfb_prototype_taps

M, K, ITERS = 4096, 8, 256
F = 2048


def _kern(variant, TF, M1, M2,
          xr_ref, xi_ref, tl_ref, h_ref,
          w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
          bw1r_ref, bw1i_ref, twtr_ref, twti_ref,
          yr_ref, yi_ref, hr_ref, hi_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        hr_ref[...] = tl_ref[0]
        hi_ref[...] = tl_ref[1]

    if variant == "dft_only":
        ur, ui = xr_ref[...], xi_ref[...]
    elif variant == "pfb_noshift":
        # TIMING-ONLY (wrong numerics): every tap reads the SAME aligned
        # slice — isolates the cost of the 8 sublane-shifted slice reads
        # vs the multiply-adds themselves
        fr = jnp.concatenate([hr_ref[...], xr_ref[...]], axis=0)
        fi = jnp.concatenate([hi_ref[...], xi_ref[...]], axis=0)
        hr_ref[...] = fr[TF:]
        hi_ref[...] = fi[TF:]
        ur = jnp.zeros((TF, M1, M2), jnp.float32)
        ui = jnp.zeros((TF, M1, M2), jnp.float32)
        fr0 = fr[K - 1: K - 1 + TF]
        fi0 = fi[K - 1: K - 1 + TF]
        for t in range(K):
            w = h_ref[t][None]
            ur = ur + w * fr0
            ui = ui + w * fi0
    else:
        fr = jnp.concatenate([hr_ref[...], xr_ref[...]], axis=0)
        fi = jnp.concatenate([hi_ref[...], xi_ref[...]], axis=0)
        hr_ref[...] = fr[TF:]
        hi_ref[...] = fi[TF:]
        ur = jnp.zeros((TF, M1, M2), jnp.float32)
        ui = jnp.zeros((TF, M1, M2), jnp.float32)
        for t in range(K):
            w = h_ref[t][None]
            ur = ur + w * fr[K - 1 - t: K - 1 - t + TF]
            ui = ui + w * fi[K - 1 - t: K - 1 - t + TF]
    if variant == "pfb_noshift":
        yr_ref[...] = ur
        yi_ref[...] = ui
        return

    if variant == "pfb_only":
        yr_ref[...] = ur
        yi_ref[...] = ui
        return

    if variant in ("base_b3", "dft_only"):
        _mm = _mm_p("b3")
        w1r, w1i = w1r_ref[...], w1i_ref[...]
        ar = _mm(ur, w1r) - _mm(ui, w1i)   # (TF, n2, k1)
        ai = _mm(ur, w1i) + _mm(ui, w1r)
        twr, twi = twr_ref[...], twi_ref[...]
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr
        w2r, w2i = w2r_ref[...], w2i_ref[...]
        yr_ref[...] = _mm(br, w2r) - _mm(bi, w2i)  # (TF, k1, k2)
        yi_ref[...] = _mm(br, w2i) + _mm(bi, w2r)
        return

    # batched_b3: stage 1 as (TF,)-batched (k1, n1) x (n1, n2) -> (TF, k1, n2)
    bdims = (((2,), (1,)), ((0,), (0,)))

    def bmm(a, b):  # a (TF, k1, n1) const, b (TF, n1, n2) data, bf16x3
        a_hi, a_lo = _bf16_split(a)
        b_hi, b_lo = _bf16_split(b)
        d = lambda x, y: lax.dot_general(x, y, bdims,
                                         preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

    w1tr, w1ti = bw1r_ref[...], bw1i_ref[...]  # (TF, k1, n1) = W1^T bcast
    ar = bmm(w1tr, ur) - bmm(w1ti, ui)  # (TF, k1, n2)
    ai = bmm(w1tr, ui) + bmm(w1ti, ur)
    twr, twi = twtr_ref[...], twti_ref[...]    # (1, k1, n2) = TW^T
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    mdims = (((2,), (0,)), ((), ()))           # contract minor n2 (full 128)

    def mm2(a, b):
        a_hi, a_lo = _bf16_split(a)
        b_hi, b_lo = _bf16_split(b)
        d = lambda x, y: lax.dot_general(x, y, mdims,
                                         preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

    w2r, w2i = w2r_ref[...], w2i_ref[...]      # (n2, k2)
    yr_ref[...] = mm2(br, w2r) - mm2(bi, w2i)  # (TF, k1, k2) native
    yi_ref[...] = mm2(br, w2i) + mm2(bi, w2r)


def build(variant, TF=32):
    M1, M2, w1r, w1i, w2r, w2i, twr, twi = _dft_consts(M)
    proto = pfb_prototype_taps(M, K).reshape(K, M).astype(np.float32)
    grid = F // TF
    bw1r = np.broadcast_to(w1r.T, (TF, M1, M1)).copy()
    bw1i = np.broadcast_to(w1i.T, (TF, M1, M1)).copy()
    twtr = np.ascontiguousarray(twr.T)[None]  # (1, k1, n2)
    twti = np.ascontiguousarray(twi.T)[None]
    kern = functools.partial(_kern, variant, TF, M1, M2)
    whole = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))

    def call(tl, xr, xi):
        yr, yi = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                whole((2, K - 1, M1, M2)), whole((K, M1, M2)),
                whole((M1, M1)), whole((M1, M1)),
                whole((M2, M2)), whole((M2, M2)),
                whole((M2, M1)), whole((M2, M1)),
                whole((TF, M1, M1)), whole((TF, M1, M1)),
                whole((1, M1, M2)), whole((1, M1, M2)),
            ],
            out_specs=[pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                       pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((F, M1, M2), jnp.float32),
                       jax.ShapeDtypeStruct((F, M1, M2), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((K - 1, M1, M2), jnp.float32),
                            pltpu.VMEM((K - 1, M1, M2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )(xr.reshape(F, M1, M2), xi.reshape(F, M1, M2), tl,
          jnp.asarray(proto.reshape(K, M1, M2)),
          jnp.asarray(w1r), jnp.asarray(w1i), jnp.asarray(w2r),
          jnp.asarray(w2i), jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(bw1r), jnp.asarray(bw1i),
          jnp.asarray(twtr), jnp.asarray(twti))
        return yr, yi

    return call


def check_parity():
    """batched_b3 == base_b3 within b3 tolerance (CPU interpret)."""
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal(F * M).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(F * M).astype(np.float32))
    M1, M2 = _dft_consts(M)[:2]
    tl = jnp.zeros((2, K - 1, M1, M2), jnp.float32)
    a = jax.jit(build("base_b3"))(tl, xr, xi)
    b = jax.jit(build("batched_b3"))(tl, xr, xi)
    err = max(float(jnp.max(jnp.abs(a[0] - b[0]))),
              float(jnp.max(jnp.abs(a[1] - b[1]))))
    scale = float(jnp.max(jnp.abs(a[0])))
    print(f"parity batched_b3 vs base_b3: max abs err {err:.3e} "
          f"(scale {scale:.1f})")
    assert err <= 2e-3 * scale, err


def bench(variant, TF=32):
    M1, M2 = _dft_consts(M)[:2]
    call = build(variant, TF)
    T = F * M
    rng = np.random.default_rng(3)
    wb = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))

    def run(wb, n):
        tl0 = jnp.zeros((2, K - 1, M1, M2), jnp.float32)

        def body(_, carry):
            tl, acc = carry
            yr, yi = call(tl, wb[0], wb[1])
            # thread the OUTPUT back into the next iteration's input: an
            # invariant body would be LICM-hoisted and timed ONCE (the
            # first version of this probe read 68 Gsps that way — the
            # classic axon-bench trap); 1e-20 keeps the values ~zero
            tl = jnp.stack([yr[: K - 1], yi[: K - 1]]) * jnp.float32(1e-20)
            return tl, acc + jnp.sum(jnp.abs(yr[-1])) + jnp.sum(jnp.abs(yi[-1]))

        return jax.lax.fori_loop(0, n, body, (tl0, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n")
    tl, s = runj(wb, n=ITERS)
    float(s)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, s = runj(wb, n=ITERS)
        float(s)
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    ms = dt / ITERS * 1e3
    variant = f"{variant}/TF{TF}" if TF != 32 else variant
    print(f"{variant:12s} {ms:7.3f} ms/block  {T * ITERS / dt / 1e9:6.2f} Gsps"
          f"  (runs {[round(x, 4) for x in sorted(dts)]})", flush=True)
    return ms


if __name__ == "__main__":
    import sys

    if "--parity" in sys.argv:
        check_parity()
    else:
        for v in ("pfb_only", "pfb_noshift", "dft_only", "base_b3",
                  "batched_b3"):
            bench(v)
        for tf in (16, 64):
            bench("batched_b3", TF=tf)
