"""Micro-probes of the fused front-end kernel: which part costs the 1.2 ms?
Variants (numerically wrong where noted — perf probes only):
  full      — the real kernel
  no_osc    — oscillator replaced by constants (keeps mix+FIR+transpose)
  no_tr     — transpose skipped (reads planes as if time-major; wrong values)
  osc_only  — oscillator generated and summed, no mix/FIR
  copy_only — transpose + sum (pure data movement)
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from radioframe.kernels.fused_frontend import _SCALE, FusedFrontend
from radioframe.ops import nco
from radioframe.ops.filter_design import cic_equivalent_taps

R, J0 = 8, 4
TM = 128
Cp = 128
T = 131072
M = T // R
GRID = M // TM
W = TM * R
F = TM + J0


def _mk_kernel(variant):
    def kernel(xr_ref, xi_ref, tl_ref, word_ref, acc_ref, w2_ref, out_ref):
        i = pl.program_id(0)
        if variant == "no_tr":
            x3r = xr_ref[...].reshape(TM, R, Cp)[:, :, :]  # wrong values, same bytes
            x3i = xi_ref[...].reshape(TM, R, Cp)
        else:
            x3r = jnp.transpose(xr_ref[...]).reshape(TM, R, Cp)
            x3i = jnp.transpose(xi_ref[...]).reshape(TM, R, Cp)
        t3r = tl_ref[0, 0].reshape(J0, R, Cp)
        t3i = tl_ref[0, 1].reshape(J0, R, Cp)
        fr = jnp.concatenate([t3r, x3r], axis=0)
        fi = jnp.concatenate([t3i, x3i], axis=0)

        if variant == "copy_only":
            out_ref[0, 0] = jnp.sum(fr[J0:].reshape(TM, R, Cp), axis=1)
            out_ref[0, 1] = jnp.sum(fi[J0:].reshape(TM, R, Cp), axis=1)
            return

        word = word_ref[...]
        acc = acc_ref[...]
        if variant == "no_osc":
            ca = jnp.full((F, R, Cp), 0.6, jnp.float32)
            sa = jnp.full((F, R, Cp), 0.8, jnp.float32)
        else:
            g = (i * TM - J0) + jax.lax.broadcasted_iota(jnp.int32, (F, Cp), 0)
            a1 = (acc + word * (g * R)).astype(jnp.float32) * _SCALE
            p32 = jax.lax.broadcasted_iota(jnp.int32, (R, Cp), 0)
            a2 = (word * p32).astype(jnp.float32) * _SCALE
            c1, s1 = jnp.cos(a1)[:, None, :], jnp.sin(a1)[:, None, :]
            c2, s2 = jnp.cos(a2)[None, :, :], jnp.sin(a2)[None, :, :]
            ca = c1 * c2 - s1 * s2
            sa = c1 * s2 + s1 * c2
        if variant == "osc_only":
            out_ref[0, 0] = jnp.sum(ca[J0:].reshape(TM, R, Cp) if False else ca[:TM], axis=1)
            out_ref[0, 1] = jnp.sum(sa[:TM], axis=1)
            return
        mr = fr * ca - fi * sa
        mi = fr * sa + fi * ca
        accR = jnp.zeros((TM, R, Cp), jnp.float32)
        accI = jnp.zeros((TM, R, Cp), jnp.float32)
        for j in range(J0 + 1):
            wj = w2_ref[j : j + 1]
            accR = accR + mr[j : j + TM] * wj
            accI = accI + mi[j : j + TM] * wj
        out_ref[0, 0] = jnp.sum(accR, axis=1)
        out_ref[0, 1] = jnp.sum(accI, axis=1)

    return kernel


def run_variant(variant, iters=64):
    taps = cic_equivalent_taps(R, 4, 1)
    fus = FusedFrontend(taps, R)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((Cp, T)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((Cp, T)).astype(np.float32))
    tails = jnp.asarray(rng.standard_normal((GRID, 2, fus.H, Cp)).astype(np.float32))
    word2 = jnp.asarray(rng.integers(-2**30, 2**30, (1, Cp), dtype=np.int32))
    acc2 = jnp.zeros((1, Cp), jnp.int32)
    w2in = jnp.asarray(fus.w2)[:, :, None]

    kern = _mk_kernel(variant)

    def call(xr, xi, tails, word2, acc2, w2in):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((1, 2, fus.H, Cp), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((J0 + 1, R, 1), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, TM, Cp), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID, 2, TM, Cp), jnp.float32),
        )(xr, xi, tails, word2, acc2, w2in)

    def run(xr, xi, tails, word2, acc2, w2in, n):
        # thread the accumulator through the INPUT: an un-threaded body is
        # loop-invariant and gets hoisted (LICM), so the loop measures the
        # dispatch floor plus ONE call — this bug made the r1 "44% of HBM
        # peak" figure untrustworthy (ROADMAP r4 bound argument)
        def body(_, s):
            out = call(xr * (1.0 + s * 1e-20), xi, tails, word2, acc2, w2in)
            return s + jnp.sum(out[:, :, -1, :1])
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    f = jax.jit(run, static_argnames="n")
    s = f(xr, xi, tails, word2, acc2, w2in, n=iters)
    float(s)
    t0 = time.perf_counter()
    s = f(xr, xi, tails, word2, acc2, w2in, n=iters)
    float(s)
    dt = time.perf_counter() - t0
    print(f"{variant:10s}: {dt*1e3/iters:.3f} ms/call")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["copy_only", "osc_only", "no_osc", "no_tr", "full"]):
        run_variant(v)
