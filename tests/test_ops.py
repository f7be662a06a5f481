"""JAX ops vs the A0 golden model (SURVEY.md §4.2 #1): near-fp32 tolerance,
plus block-split/state-handoff invariance for every stateful op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radioframe.golden import model as G
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.ops import filter_design as FD
from radioframe.ops import nco
from radioframe.ops.fir import FirDecimator, cic_decimator
from radioframe.ops.ols import OverlapSave
from radioframe.ops.scans import affine_scan, maxdecay_scan


def _iq(rng, C, T):
    return (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64)


class TestNCO:
    def test_matches_golden_at_quantized_freq(self, rng):
        fs = 192000.0
        x = _iq(rng, 3, 4096)
        freqs = np.array([37000.0, -15000.0, 123.456])
        words = nco.freq_word(freqs, fs)
        fq = nco.word_to_freq(words, fs)  # golden runs at the quantized freqs
        y, _ = jax.jit(nco.mix_down)(jnp.asarray(x), jnp.asarray(words), nco.init_state(3))
        for c in range(3):
            ref, _ = G.nco_mix(x[c], fq[c], fs)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=2e-5)

    def test_phase_continuity_exact(self, rng):
        fs = 48000.0
        x = _iq(rng, 1, 2048)
        w = jnp.asarray(nco.freq_word(1234.5, fs))[None]
        acc = nco.init_state(1)
        # split on a multiple of the oscillator factorization group (128) so
        # the int32 phase grids coincide -> bit-exact continuation
        y1, acc1 = nco.mix_down(jnp.asarray(x[:, :1024]), w, acc)
        y2, _ = nco.mix_down(jnp.asarray(x[:, 1024:]), w, acc1)
        whole, _ = nco.mix_down(jnp.asarray(x), w, acc)
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        np.testing.assert_array_equal(got[:, 1024:], np.asarray(whole)[:, 1024:])

    def test_long_stream_no_phase_drift(self, rng):
        # 100 blocks of 4096: int32 accumulator keeps phase exact vs float64
        fs = 192000.0
        w = nco.freq_word(37000.0, fs)
        acc = nco.init_state(1)
        ones = jnp.ones((1, 4096), jnp.complex64)
        step = jax.jit(nco.mix_down)
        for _ in range(100):
            y, acc = step(ones, jnp.asarray(w)[None], acc)
        n_last = 100 * 4096 - 1
        expected = np.exp(-1j * 2 * np.pi * (nco.word_to_freq(w, fs) / fs) * n_last)
        got = np.asarray(y)[0, -1]
        assert abs(got - expected) < 1e-4


class TestFIR:
    @pytest.mark.parametrize("R", [1, 2, 4])
    def test_real_taps_vs_golden(self, rng, R):
        taps = FD.lowpass_taps(63, 0.2, 1.0)
        op = FirDecimator(taps, R)
        x = _iq(rng, 4, 512)
        y, _ = jax.jit(op)(op.init_state(4), jnp.asarray(x))
        for c in range(4):
            ref, _ = G.fir_decimate(x[c].astype(np.complex128), taps, R)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-5)

    def test_complex_taps_vs_golden(self, rng):
        taps = FD.complex_bandpass_taps(101, 300.0, 2700.0, 48000.0)
        op = FirDecimator(taps, 2)
        x = _iq(rng, 2, 600)
        y, _ = jax.jit(op)(op.init_state(2), jnp.asarray(x))
        for c in range(2):
            ref, _ = G.fir_decimate(x[c].astype(np.complex128), taps, 2)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-5)

    def test_streaming_state_handoff(self, rng):
        taps = FD.lowpass_taps(63, 0.2, 1.0)
        op = FirDecimator(taps, 4)
        x = _iq(rng, 2, 1024)
        whole, _ = op(op.init_state(2), jnp.asarray(x))
        st = op.init_state(2)
        outs = []
        for blk in np.split(x, 4, axis=-1):
            y, st = op(st, jnp.asarray(blk))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=-1), np.asarray(whole), atol=1e-6)

    def test_cic_vs_golden(self, rng):
        op = cic_decimator(8, 4)
        x = _iq(rng, 2, 1024)
        y, _ = jax.jit(op)(op.init_state(2), jnp.asarray(x))
        for c in range(2):
            ref, _ = G.cic_decimate(x[c].astype(np.complex128), 8, 4)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-5)


class TestScans:
    def test_affine_scan_matches_loop(self, rng):
        a = rng.uniform(0.5, 1.0, (3, 200)).astype(np.float32)
        b = rng.standard_normal((3, 200)).astype(np.float32)
        s0 = rng.standard_normal(3).astype(np.float32)
        got = np.asarray(affine_scan(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s0)))
        for c in range(3):
            s = s0[c]
            for n in range(200):
                s = a[c, n] * s + b[c, n]
                assert abs(got[c, n] - s) < 1e-4

    def test_maxdecay_scan_matches_loop(self, rng):
        a = np.full((2, 300), 0.99, np.float32)
        v = np.abs(rng.standard_normal((2, 300))).astype(np.float32)
        s0 = np.array([0.0, 5.0], np.float32)
        got = np.asarray(maxdecay_scan(jnp.asarray(a), jnp.asarray(v), jnp.asarray(s0)))
        for c in range(2):
            s = s0[c]
            for n in range(300):
                s = max(0.99 * s, v[c, n])
                np.testing.assert_allclose(got[c, n], s, rtol=1e-5)


class TestAGC:
    def test_vs_golden(self, rng):
        x = _iq(rng, 2, 500) * np.exp(np.sin(np.arange(500) / 40.0))[None, :]
        y, env, _ = jax.jit(lambda e, x: agc_op.apply(e, x, 0.999))(agc_op.init_state(2), jnp.asarray(x))
        for c in range(2):
            ref, env_ref, _ = G.agc(x[c].astype(np.complex128), 0.999)
            np.testing.assert_allclose(np.asarray(y)[c], ref, rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(np.asarray(env)[c], env_ref, rtol=1e-4)

    def test_state_handoff(self, rng):
        x = _iq(rng, 1, 400)
        whole, _, _ = agc_op.apply(agc_op.init_state(1), jnp.asarray(x), 0.995)
        y1, e1, _ = agc_op.apply(agc_op.init_state(1), jnp.asarray(x[:, :150]), 0.995)
        y2, _, _ = agc_op.apply(e1, jnp.asarray(x[:, 150:]), 0.995)
        got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
        np.testing.assert_allclose(got, np.asarray(whole), rtol=2e-4, atol=2e-5)


class TestOLS:
    def test_vs_golden_real_and_complex_taps(self, rng):
        for taps in (FD.lowpass_taps(129, 3000.0, 48000.0),
                     FD.complex_bandpass_taps(257, 300.0, 2700.0, 48000.0)):
            op = OverlapSave(taps, hop=512)
            T = op.hop * 4
            x = _iq(rng, 2, T)
            y, _ = jax.jit(op)(op.init_state(2), jnp.asarray(x))
            for c in range(2):
                ref, _ = G.ols_filter(x[c].astype(np.complex128), taps)
                np.testing.assert_allclose(np.asarray(y)[c], ref, atol=3e-4)

    def test_streaming(self, rng):
        taps = FD.lowpass_taps(129, 3000.0, 48000.0)
        op = OverlapSave(taps, hop=256)
        x = _iq(rng, 1, 4 * op.hop)
        whole, _ = op(op.init_state(1), jnp.asarray(x))
        st = op.init_state(1)
        outs = []
        for blk in np.split(x, 4, axis=-1):
            y, st = op(st, jnp.asarray(blk))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=-1), np.asarray(whole), atol=1e-5)


class TestDemod:
    def test_dc_block_vs_golden(self, rng):
        x = (rng.standard_normal((2, 300)) + 0.5).astype(np.float32)
        y, _ = demod_op.dc_block(demod_op.dc_block_init(2), jnp.asarray(x))
        for c in range(2):
            ref, _ = G.dc_block(x[c].astype(np.float64))
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-4)

    def test_nfm_vs_golden(self, rng):
        x = np.exp(1j * np.cumsum(rng.standard_normal((2, 400)) * 0.1, axis=-1)).astype(np.complex64)
        y, _ = demod_op.demod_nfm(jnp.ones(2, jnp.complex64), jnp.asarray(x), 48000.0, 2500.0)
        for c in range(2):
            ref, _ = G.demod_nfm(x[c].astype(np.complex128), 48000.0, 2500.0)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-3)

    def test_bank_selects_per_channel(self, rng):
        x = _iq(rng, 4, 256)
        mode = jnp.asarray([demod_op.SSB, demod_op.CW, demod_op.AM, demod_op.NFM], jnp.int32)
        tone = jnp.asarray(np.broadcast_to(nco.freq_word(600.0, 48000.0), (4,)).copy())
        st = demod_op.bank_init(4)
        y, _ = jax.jit(lambda s, x: demod_op.bank_apply(s, x, mode, tone, 48000.0))(st, jnp.asarray(x))
        # channel 0 must equal pure SSB demod; channel 3 pure NFM
        np.testing.assert_allclose(np.asarray(y)[0], 2 * np.real(x[0]), atol=1e-5)
        ref_nfm, _ = G.demod_nfm(x[3].astype(np.complex128), 48000.0, 2500.0)
        np.testing.assert_allclose(np.asarray(y)[3], ref_nfm, atol=1e-3)


class TestSamGoldenParity:
    def test_sam_vs_golden(self, rng):
        # mistuned AM baseband: carrier at +90 Hz with 600 Hz tone
        fs = 48_000.0
        t = np.arange(4096) / fs
        base = (1.0 + 0.8 * np.sin(2 * np.pi * 600.0 * t)) * np.exp(2j * np.pi * 90.0 * t)
        x = np.stack([base, 0.5 * base]).astype(np.complex64)
        y, dc, acc = demod_op.demod_sam(
            demod_op.dc_block_init(2), jnp.zeros((2, 2), jnp.float32), jnp.asarray(x), fs)
        for c in range(2):
            ref, _, (ph, w) = G.demod_sam(x[c].astype(np.complex128), fs)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=2e-3)
            np.testing.assert_allclose(float(np.asarray(acc)[1, c]), w, atol=1e-6)

    def test_squelch_vs_golden(self, rng):
        audio = rng.standard_normal((1, 2048)).astype(np.float32) * 3.0
        y, ns, is_open = demod_op.squelch(jnp.zeros(1, jnp.float32), jnp.asarray(audio))
        ref_y, ref_ns, ref_open = G.squelch(audio[0].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[0], ref_y, atol=1e-4)
        np.testing.assert_allclose(float(np.asarray(ns)[0]), ref_ns, rtol=1e-4)
        assert bool(np.asarray(is_open)[0]) == ref_open


def test_ols_bank_apply_selected_matches_full_bank(rng):
    """Frequency-domain per-channel selection == full bank + take_along_axis
    (the gather commutes with the linear IFFT): one IFFT instead of K."""
    from radioframe.ops import filter_design as FD
    from radioframe.ops.ols import OverlapSaveBank

    bank = OverlapSaveBank(
        [FD.complex_bandpass_taps(513, 300.0, 2700.0, 48e3),
         FD.complex_bandpass_taps(513, -250.0, 250.0, 48e3),
         FD.complex_bandpass_taps(513, -5000.0, 5000.0, 48e3)],
        hop=512)
    C, T = 6, 2048
    x = jnp.asarray((rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T)))
                    .astype(np.complex64))
    row = jnp.asarray(np.arange(C) % 3, jnp.int32)
    full, tail_a = bank(bank.init_state(C), x)
    want = np.take_along_axis(np.asarray(full), np.asarray(row)[None, :, None], axis=0)[0]
    got, tail_b = bank.apply_selected(bank.init_state(C), x, row)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tail_a), np.asarray(tail_b))


class TestZoomSpectrum:
    def test_zoom_resolves_close_tones(self, rng):
        """Two tones 100 Hz apart at 192 kHz: unresolvable in a 1024-bin
        panorama (188 Hz/bin), cleanly split at zoom x16 (11.7 Hz/bin)."""
        from radioframe.ops import nco
        from radioframe.ops.spectrum import Spectrum, ZoomSpectrum

        fs, Z, nfft = 192_000.0, 16, 1024
        f0 = 12_000.0
        T = 4 * Z * nfft
        t = np.arange(T) / fs
        x = (np.exp(2j * np.pi * (f0 - 50.0) * t) +
             np.exp(2j * np.pi * (f0 + 50.0) * t)).astype(np.complex64)[None, :]
        zoom = ZoomSpectrum(nfft, Z)
        word = jnp.asarray([nco.freq_word(f0, fs)], jnp.int32)
        lines, _ = jax.jit(zoom)(zoom.init_state(1), jnp.asarray(x), word)
        line = np.asarray(lines)[0, -1]
        # find the two peaks: they sit ±50 Hz from center at 11.7 Hz/bin
        res = fs / Z / nfft
        k = np.argsort(line)[::-1]
        # take the top two local maxima separated by > 4 bins
        top = [int(k[0])]
        for kk in k[1:]:
            if abs(int(kk) - top[0]) > 4:
                top.append(int(kk))
                break
        got_hz = sorted(((np.array(top) - nfft // 2) * res).tolist())
        np.testing.assert_allclose(got_hz, [-50.0, 50.0], atol=1.5 * res)

    def test_streaming_state(self, rng):
        """Split blocks == one shot (NCO + decimator + EMA state carry)."""
        from radioframe.ops import nco
        from radioframe.ops.spectrum import ZoomSpectrum

        zoom = ZoomSpectrum(256, 4, avg=0.5)
        x = (rng.standard_normal((2, 8 * 1024)) +
             1j * rng.standard_normal((2, 8 * 1024))).astype(np.complex64)
        word = jnp.asarray(nco.freq_word(np.array([1e3, -2e3]), 192e3))
        whole, _ = zoom(zoom.init_state(2), jnp.asarray(x), word)
        st = zoom.init_state(2)
        outs = []
        for blk in np.split(x, 2, axis=-1):
            lines, st = zoom(st, jnp.asarray(blk), word)
            outs.append(np.asarray(lines))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, np.asarray(whole), atol=1e-3)


class TestFastScans:
    """Constant-coefficient scan fast paths == associative scans
    (ops/scans.py round-3 note; probe: tools/probe_scans.py)."""

    def test_affine_const_matches(self, rng):
        from radioframe.ops.scans import affine_const_ok, affine_scan, affine_scan_const

        C, T = 16, 1024
        a_ch = jnp.asarray(rng.uniform(0.93, 0.999, C).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
        s0 = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        assert affine_const_ok(np.asarray(a_ch))
        ref = affine_scan(jnp.broadcast_to(a_ch[:, None], (C, T)), b, s0)
        got = affine_scan_const(a_ch, b, s0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_affine_const_zero_rows_exact(self, rng):
        from radioframe.ops.scans import affine_scan_const

        C, T = 8, 512
        a_ch = jnp.asarray(np.r_[np.zeros(4), np.full(4, 0.98)].astype(np.float32))
        b = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
        s0 = jnp.zeros((C,), jnp.float32)
        got = affine_scan_const(a_ch, b, s0)
        # a == 0 rows: s[n] == b[n] exactly (instant)
        np.testing.assert_array_equal(np.asarray(got)[:4], np.asarray(b)[:4])

    def test_maxdecay_const_matches(self, rng):
        from radioframe.ops.scans import (maxdecay_const_ok, maxdecay_scan,
                                          maxdecay_scan_const)

        C, T = 16, 2048
        a_ch = jnp.asarray(np.exp(-1.0 / (rng.uniform(0.25, 0.8, C) * 15000.0))
                           .astype(np.float32))
        v = jnp.asarray(np.abs(rng.standard_normal((C, T))).astype(np.float32))
        s0 = jnp.asarray(np.abs(rng.standard_normal(C)).astype(np.float32))
        assert maxdecay_const_ok(np.asarray(a_ch), T)
        ref = maxdecay_scan(jnp.broadcast_to(a_ch[:, None], (C, T)), v, s0)
        got = maxdecay_scan_const(a_ch, v, s0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_ok_guards(self):
        from radioframe.ops.scans import affine_const_ok, maxdecay_const_ok

        assert affine_const_ok([0.995, 0.98, 0.0])
        assert not affine_const_ok([0.5])      # rescale would blow up
        assert maxdecay_const_ok([0.9999], 2048)
        assert not maxdecay_const_ok([0.99], 2048)  # 0.99^-2047 huge


class TestOlsMxuDft:
    """OverlapSaveBank(mxu_dft=True) — the TPU's two-matmul Cooley-Tukey
    DFT path — matches the jnp.fft path exactly (r4)."""

    def test_bank_paths_match(self, rng):
        from radioframe.ops import filter_design as FD
        from radioframe.ops.ols import OverlapSaveBank

        taps = [FD.complex_bandpass_taps(513, 300.0, 2700.0, 48e3),
                FD.complex_bandpass_taps(513, -5e3, 5e3, 48e3)]
        a = OverlapSaveBank(taps, hop=512, mxu_dft=False)
        b = OverlapSaveBank(taps, hop=512, mxu_dft=True)
        C, T = 3, 2048
        x = jnp.asarray((rng.standard_normal((C, T))
                         + 1j * rng.standard_normal((C, T))).astype(np.complex64))
        row = jnp.asarray([0, 1, 0], jnp.int32)
        ya, _ = a.apply_selected(a.init_state(C), x, row)
        yb, _ = b.apply_selected(b.init_state(C), x, row)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ya), atol=2e-5)
        fa, _ = a(a.init_state(C), x)
        fb, _ = b(b.init_state(C), x)
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), atol=2e-5)
