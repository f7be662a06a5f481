"""Channelizer optimization probe (VERDICT r2 ask #3): candidate rewrites
measured against the current stages on the real TPU.

  a. PFB as f32-plane shifted-add in (F, M) layout + last-axis FFT
     (+ transpose to (M, F)) vs current grouped-conv + strided FFT
  b. demod-bank select as fused mask-multiply vs stack + take_along_axis
  c. waterfall from the PFB output with frame averaging vs separate
     hann FFT + per-frame log10
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
wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
chans_ri = jnp.asarray(rng.standard_normal((2, M, F)).astype(np.float32))

from radioframe.ops.filter_design import pfb_prototype_taps

h_np = pfb_prototype_taps(M, K).reshape(K, M).astype(np.float32)


def timed(name, fn, *args):
    f = jax.jit(fn, static_argnames="n")
    s = f(*args, n=ITERS)
    float(s)
    t0 = time.perf_counter()
    s = f(*args, n=ITERS)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.3f} ms/block   ({T/dt/1e9:6.2f} Gsps wideband-equiv)")
    return dt


# -- a. PFB planes shifted-add + last-axis FFT + transpose --------------------
def pfb_planes(tail_r, tail_i, xr, xi):
    """(K-1)M tails + (T,) planes -> y planes (M, F) channel-major."""
    xpr = jnp.concatenate([tail_r, xr])
    xpi = jnp.concatenate([tail_i, xi])
    frr = xpr.reshape(F + K - 1, M)
    fri = xpi.reshape(F + K - 1, M)
    ur = jnp.zeros((F, M), jnp.float32)
    ui = jnp.zeros((F, M), jnp.float32)
    for t in range(K):
        w = h_np[t][None, :]
        ur = ur + w * frr[K - 1 - t: K - 1 - t + F]
        ui = ui + w * fri[K - 1 - t: K - 1 - t + F]
    y = jnp.fft.fft(lax.complex(ur, ui), axis=-1)  # (F, M), contiguous axis
    yt = jnp.transpose(y)  # (M, F) channel-major for the demod bank
    return yt, xpr[-(K - 1) * M:], xpi[-(K - 1) * M:]


def run_pfb_planes(wb_ri, n):
    z = jnp.zeros(((K - 1) * M,), jnp.float32)

    def body(_, carry):
        tr, ti, acc = carry
        y, tr, ti = pfb_planes(tr, ti, wb_ri[0], wb_ri[1])
        return tr, ti, acc + jnp.abs(y[-1, -1])

    return lax.fori_loop(0, n, body, (z, z, jnp.float32(0.0)))[2]


# -- a2. same but WITHOUT the final transpose (frame-major out) ---------------
def run_pfb_planes_notr(wb_ri, n):
    z = jnp.zeros(((K - 1) * M,), jnp.float32)

    def body(_, carry):
        tr, ti, acc = carry
        xpr = jnp.concatenate([tr, wb_ri[0]])
        xpi = jnp.concatenate([ti, wb_ri[1]])
        frr = xpr.reshape(F + K - 1, M)
        fri = xpi.reshape(F + K - 1, M)
        ur = jnp.zeros((F, M), jnp.float32)
        ui = jnp.zeros((F, M), jnp.float32)
        for t in range(K):
            w = h_np[t][None, :]
            ur = ur + w * frr[K - 1 - t: K - 1 - t + F]
            ui = ui + w * fri[K - 1 - t: K - 1 - t + F]
        y = jnp.fft.fft(lax.complex(ur, ui), axis=-1)
        return xpr[-(K - 1) * M:], xpi[-(K - 1) * M:], acc + jnp.abs(y[-1, -1])

    return lax.fori_loop(0, n, body, (z, z, jnp.float32(0.0)))[2]


# -- b. demod bank with fused mask-multiply select ----------------------------
from radioframe.core.config import AgcConfig
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op

bank = agc_op.AgcBank((AgcConfig(),) * 6, 15000.0)
mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
cw_word = jnp.full((M,), 1234, jnp.int32)


def bank_apply_masked(state, x, mode, cw_tone_word, fs, nfm_dev):
    y_ssb = demod_op.demod_ssb(x)
    y_cw, cw_phase = demod_op.demod_cw(state["cw_phase"], x, cw_tone_word)
    y_am, am_dc = demod_op.demod_am(state["am_dc"], x)
    y_nfm, nfm_last = demod_op.demod_nfm(state["nfm_last"], x, fs, nfm_dev)
    y_sam, sam_dc, sam_carrier = demod_op.demod_sam(
        state["sam_dc"], state["sam_carrier"], x, fs)
    m = mode[:, None]
    sel = (jnp.where((m == 0) | (m == 4), y_ssb, 0.0)
           + jnp.where(m == 1, y_cw, 0.0)
           + jnp.where(m == 2, y_am, 0.0)
           + jnp.where(m == 3, y_nfm, 0.0)
           + jnp.where(m == 5, y_sam, 0.0))
    new_state = {"cw_phase": cw_phase, "am_dc": am_dc, "nfm_last": nfm_last,
                 "sam_dc": sam_dc, "sam_carrier": sam_carrier}
    return sel.astype(jnp.float32), new_state


def run_demod_masked(chans_ri, n):
    chans = lax.complex(chans_ri[0], chans_ri[1])

    def body(_, carry):
        dstate, astate, acc = carry
        audio, dstate = bank_apply_masked(dstate, chans, mode, cw_word, 15000.0, 2500.0)
        agc_audio, astate, gain = bank.apply(astate, audio, mode)
        return dstate, astate, acc + jnp.abs(agc_audio[-1, -1])

    return lax.fori_loop(
        0, n, body, (demod_op.bank_init(M), bank.init_state(M), jnp.float32(0.0)))[2]


def run_demod_current(chans_ri, n):
    chans = lax.complex(chans_ri[0], chans_ri[1])

    def body(_, carry):
        dstate, astate, acc = carry
        audio, dstate = demod_op.bank_apply(dstate, chans, mode, cw_word, 15000.0, 2500.0)
        agc_audio, astate, gain = bank.apply(astate, audio, mode)
        return dstate, astate, acc + jnp.abs(agc_audio[-1, -1])

    return lax.fori_loop(
        0, n, body, (demod_op.bank_init(M), bank.init_state(M), jnp.float32(0.0)))[2]


# equality check: masked == gather select (exact: same terms, no reassoc)
def _eq(chans_ri):
    chans = lax.complex(chans_ri[0], chans_ri[1])
    a1, _ = demod_op.bank_apply(demod_op.bank_init(M), chans, mode, cw_word, 15000.0, 2500.0)
    a2, _ = bank_apply_masked(demod_op.bank_init(M), chans, mode, cw_word, 15000.0, 2500.0)
    return jnp.max(jnp.abs(a1 - a2))


print("masked vs gather select max |d|:", float(jax.jit(_eq)(chans_ri)))

# -- b2. demod scans only (dc_block x2) --------------------------------------
def run_scans_only(chans_ri, n):
    chans = lax.complex(chans_ri[0], chans_ri[1])

    def body(_, carry):
        st, acc = carry
        env = jnp.abs(chans).astype(jnp.float32)
        y, st = demod_op.dc_block(st, env)
        return st, acc + jnp.abs(y[-1, -1])

    return lax.fori_loop(0, n, body, (demod_op.dc_block_init(M), jnp.float32(0.0)))[1]


# -- c. waterfall from PFB output + frame averaging ---------------------------
def run_wf_from_pfb(chans_ri, n, avg=16):
    """|y|^2 frame-power average (linear), one log10 per averaged line."""

    def body(_, acc):
        p = chans_ri[0] ** 2 + chans_ri[1] ** 2  # (M, F)
        pa = p.reshape(M, F // avg, avg).mean(axis=-1)  # (M, F/avg)
        db = 10.0 * jnp.log10(jnp.maximum(pa, 1e-24))
        # fftshift channel order so lines read low..high like Spectrum
        lines = jnp.roll(db, M // 2, axis=0).T  # (F/avg, M)
        return acc + jnp.abs(lines[-1, -1])

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


from radioframe.ops.spectrum import Spectrum

spec = Spectrum(4096)


def run_wf_current(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])

    def body(_, acc):
        lines, _ = spec(spec.init_state(1), x[None, :])
        return acc + jnp.abs(lines[0, -1, -1])

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


timed("pfb_planes_fft_transpose", run_pfb_planes, wb_ri)
timed("pfb_planes_fft_frame_major", run_pfb_planes_notr, wb_ri)
timed("demod_agc_current_gather", run_demod_current, chans_ri)
timed("demod_agc_masked_select", run_demod_masked, chans_ri)
timed("dc_block_scan_only", run_scans_only, chans_ri)
timed("waterfall_current", run_wf_current, wb_ri)
timed("waterfall_from_pfb_avg16", run_wf_from_pfb, chans_ri)
