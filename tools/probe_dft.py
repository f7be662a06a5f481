"""Channelizer stage probe (VERDICT r2 ask #3): where do the 4 ms/block go?

Times, on the real TPU, for the config-5 block (M=4096, F=1024 frames):
  1. XLA batched FFT  (F, M) c64, last axis
  2. DFT via Cooley-Tukey 64x64 matmul decomposition (MXU path)
  3. PFB depthwise conv only
  4. demod bank + AGC only (channel-rate, (M, F))
  5. Spectrum waterfall only (wideband, nfft=4096)
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax

M, K, F = 4096, 8, 1024
T = M * F
ITERS = 32

rng = np.random.default_rng(0)
u_ri = jnp.asarray(rng.standard_normal((2, F, M)).astype(np.float32))
wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))


def timed(name, fn, *args):
    f = jax.jit(fn, static_argnames="n")
    s = f(*args, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    s = f(*args, n=ITERS)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:8.3f} ms/block   ({T/dt/1e9:6.2f} Gsps wideband-equiv)")
    return dt


# -- 1. XLA FFT ---------------------------------------------------------------
def run_fft(u_ri, n):
    x = lax.complex(u_ri[0], u_ri[1])

    def body(_, acc):
        y = jnp.fft.fft(x, axis=-1)
        return acc + jnp.abs(y[-1, -1])

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


# -- 2. matmul DFT (M = M1 x M2 Cooley-Tukey) --------------------------------
M1 = M2 = 64
n1 = np.arange(M1)
k1 = np.arange(M1)
W1 = np.exp(-2j * np.pi * np.outer(n1, k1) / M1).astype(np.complex64)  # (n1, k1)
n2 = np.arange(M2)
k2 = np.arange(M2)
W2 = np.exp(-2j * np.pi * np.outer(n2, k2) / M2).astype(np.complex64)
TW = np.exp(-2j * np.pi * np.outer(n2, k1) / M).astype(np.complex64)  # (n2, k1)
# keep constants as HOST numpy f32 (complex device constants can't cross
# the axon tunnel; f32 constants embed into the HLO directly)
W1r, W1i = np.ascontiguousarray(W1.real), np.ascontiguousarray(W1.imag)
W2r, W2i = np.ascontiguousarray(W2.real), np.ascontiguousarray(W2.imag)
TWr, TWi = np.ascontiguousarray(TW.real), np.ascontiguousarray(TW.imag)


def cmatmul(ar, ai, br, bi):
    """complex matmul via 4 real f32 matmuls (MXU), contracting last/first."""
    rr = ar @ br - ai @ bi
    ri = ar @ bi + ai @ br
    return rr, ri


def dft_matmul(xr, xi):
    """(..., M) -> (..., M) DFT, n = M2*n1 + n2, k = M1*k2 + k1."""
    sh = xr.shape[:-1]
    xr = xr.reshape(sh + (M1, M2))  # [n1, n2]
    xi = xi.reshape(sh + (M1, M2))
    # A[n2, k1] = sum_n1 x[n1, n2] W1[n1, k1] : contract n1
    ar = jnp.einsum("...nm,nk->...mk", xr, W1r) - jnp.einsum("...nm,nk->...mk", xi, W1i)
    ai = jnp.einsum("...nm,nk->...mk", xr, W1i) + jnp.einsum("...nm,nk->...mk", xi, W1r)
    # twiddle W_M^{n2 k1}, elementwise over (n2=m, k1=k)
    br = ar * TWr - ai * TWi
    bi = ar * TWi + ai * TWr
    # X[k2, k1] = sum_n2 B[n2, k1] W2[n2, k2] : contract n2 (axis -2)
    cr = jnp.einsum("...mk,mq->...qk", br, W2r) - jnp.einsum("...mk,mq->...qk", bi, W2i)
    ci = jnp.einsum("...mk,mq->...qk", br, W2i) + jnp.einsum("...mk,mq->...qk", bi, W2r)
    # k = M1*k2 + k1 -> flatten (k2, k1)
    return cr.reshape(sh + (M,)), ci.reshape(sh + (M,))


def run_dft_mm(u_ri, n):
    def body(_, acc):
        yr, yi = dft_matmul(u_ri[0], u_ri[1])
        return acc + jnp.abs(yr[-1, -1]) + jnp.abs(yi[-1, -1])

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


# correctness check first — on-device vs jnp.fft (axon can't fetch arrays,
# only scalars through a jitted f32 path)
def _check(u):
    gr, gi = dft_matmul(u[0], u[1])
    ref = jnp.fft.fft(lax.complex(u[0], u[1]), axis=-1)
    return jnp.max(jnp.abs(lax.complex(gr, gi) - ref))


err = float(jax.jit(_check)(u_ri))
print(f"dft_matmul max err vs jnp.fft: {err:.3e}  (scale ~{np.sqrt(M):.0f})")

# -- 3. PFB conv only (historical grouped-conv form) --------------------------
from radioframe.ops.filter_design import pfb_prototype_taps
from radioframe.ops.pfb import PfbChannelizer

op = PfbChannelizer(M, K)


def run_conv_only(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        st, acc = carry
        xp = jnp.concatenate([st, x[None, :]], axis=-1)
        fr = xp.reshape(1, F + K - 1, M)
        lhs = jnp.moveaxis(fr, -1, 1)
        h8 = pfb_prototype_taps(M, K).reshape(K, M).astype(np.float32)
        rhs = jnp.asarray(np.ascontiguousarray(h8[::-1].T)[:, None, :])

        def depthwise(r):
            return lax.conv_general_dilated(
                r, rhs, window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=M, preferred_element_type=jnp.float32)

        u = lax.complex(depthwise(jnp.real(lhs)), depthwise(jnp.imag(lhs)))
        return xp[:, -((K - 1) * M):], acc + jnp.abs(u[0, -1, -1])

    return lax.fori_loop(0, n, body, (op.init_state(1), jnp.float32(0.0)))[1]


# -- 3b. shifted-add polyphase in (F, M) layout -------------------------------
from radioframe.ops.filter_design import pfb_prototype_taps

hj = jnp.asarray(pfb_prototype_taps(M, K).reshape(K, M).astype(np.float32))


def run_shift_only(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, carry):
        st, acc = carry
        xp = jnp.concatenate([st, x[None, :]], axis=-1)
        fr = xp.reshape(1, F + K - 1, M)
        u = jnp.zeros((1, F, M), jnp.complex64)
        for t in range(K):
            u = u + hj[t][None, None, :] * fr[:, K - 1 - t: K - 1 - t + F, :]
        return xp[:, -((K - 1) * M):], acc + jnp.abs(u[0, -1, -1])

    return lax.fori_loop(0, n, body, (op.init_state(1), jnp.float32(0.0)))[1]


# -- 4. demod bank + AGC only -------------------------------------------------
from radioframe.core.config import AgcConfig
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op

bank = agc_op.AgcBank((AgcConfig(),) * 6, 15000.0)
mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
cw_word = jnp.full((M,), 1234, jnp.int32)
chans_ri = jnp.asarray(rng.standard_normal((2, M, F)).astype(np.float32))


def run_demod_agc(chans_ri, n):
    chans = lax.complex(chans_ri[0], chans_ri[1])

    def body(_, carry):
        dstate, astate, acc = carry
        audio, dstate = demod_op.bank_apply(dstate, chans, mode, cw_word, 15000.0, 2500.0)
        agc_audio, astate, gain = bank.apply(astate, audio, mode)
        return dstate, astate, acc + jnp.abs(agc_audio[-1, -1])

    return lax.fori_loop(
        0, n, body, (demod_op.bank_init(M), bank.init_state(M), jnp.float32(0.0)))[2]


# -- 5. waterfall only --------------------------------------------------------
from radioframe.ops.spectrum import Spectrum

spec = Spectrum(4096)


def run_spectrum(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, acc):
        lines, _ = spec(spec.init_state(1), x[None, :])
        return acc + jnp.abs(lines[0, -1, -1])

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


timed("xla_fft_4096", run_fft, u_ri)
timed("dft_matmul_64x64", run_dft_mm, u_ri)
timed("pfb_conv_only", run_conv_only, wb_ri)
timed("pfb_shift_only", run_shift_only, wb_ri)
timed("demod_bank_plus_agc", run_demod_agc, chans_ri)
timed("waterfall_spectrum", run_spectrum, wb_ri)
