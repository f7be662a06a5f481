"""NR / noise blanker / auto-notch / VAD: functional effectiveness tests."""

import jax
import jax.numpy as jnp
import numpy as np
from conftest import jrun, jwrap

from radioframe.core.config import RxConfig
from radioframe.diag.metrics import audio_snr_db
from radioframe.io import fixtures as FX
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.ops.interference import AutoNotch, NoiseBlanker, SpectralNR, vad
from radioframe.pipelines.rx_chain import RxChain

FS = 192_000.0


class TestNoiseBlanker:
    def test_removes_impulses(self, rng):
        x = (rng.standard_normal((1, 4096)) + 1j * rng.standard_normal((1, 4096))).astype(np.complex64)
        x *= 0.1
        hits = rng.integers(100, 4000, 25)
        x[0, hits] += 30.0  # big impulses
        nb = NoiseBlanker(threshold=4.0)
        y, _ = jrun(lambda x: nb(nb.init_state(1), x), x)
        assert np.all(np.abs(y[0, hits]) < 1e-6)  # impulses blanked
        untouched = np.setdiff1d(np.arange(4096), hits)
        frac = np.mean(np.abs(y[0, untouched]) > 0)
        assert frac > 0.95  # almost all clean samples pass through

    def test_streaming_state(self, rng):
        x = (0.1 * (rng.standard_normal((1, 2048)) + 1j * rng.standard_normal((1, 2048)))).astype(np.complex64)
        nb = NoiseBlanker()
        whole, _ = jrun(lambda x: nb(nb.init_state(1), x), x)
        st = jrun(lambda: nb.init_state(1))
        step = jwrap(nb)
        outs = []
        for b in np.split(x, 2, axis=-1):
            y, st = step(st, b)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, -1), whole, atol=1e-6)


class TestAutoNotch:
    def test_kills_carrier_keeps_voice(self):
        fs = 48_000.0
        n = 256 * 64
        voice = FX.voicelike_audio(fs, n).astype(np.complex64)
        t = np.arange(n) / fs
        carrier = 0.8 * np.exp(2j * np.pi * 1500.3 * t).astype(np.complex64)
        x = (voice + carrier)[None, :]
        notch = AutoNotch(nfft=256, ema=0.5)
        st = jrun(lambda: notch.init_state(1))
        step = jwrap(notch)
        # run twice so the EMA locks onto the persistent tone
        y, st = step(st, x)
        y, st = step(st, x)
        y = np.asarray(y)[0]
        # carrier power reduced by > 20 dB
        def tone_pow(sig):
            return np.abs(np.vdot(np.exp(2j * np.pi * 1500.3 * t), sig)) ** 2 / len(sig) ** 2
        before, after = tone_pow(x[0]), tone_pow(y)
        assert 10 * np.log10(before / max(after, 1e-30)) > 20.0
        # voice mostly survives (correlation with clean voice)
        c = np.abs(np.vdot(voice, y)) / (np.linalg.norm(voice) * np.linalg.norm(y) + 1e-12)
        assert c > 0.8


class TestSpectralNR:
    def test_suppresses_noise_keeps_bursts(self, rng):
        """NR targets intermittent (voice-like) signals: noise in the gaps
        must drop; the signal during bursts must survive. (A continuous tone
        is indistinguishable from noise floor by minimum statistics — that's
        inherent to the algorithm, not a bug.)"""
        fs = 48_000.0
        nfft, F = 256, 96
        n = nfft * F
        t = np.arange(n) / fs
        duty = (np.arange(n) // (nfft * 8)) % 2 == 0  # 8-frame on/off bursts
        sig = 0.5 * np.exp(2j * np.pi * 4 * fs / nfft * t) * duty  # bin-4 tone
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.05
        x = (sig + noise).astype(np.complex64)[None, :]
        nr = SpectralNR(nfft=nfft)
        st = jrun(lambda: nr.init_state(1))
        step = jwrap(nr)
        y, st = step(st, x)
        y, st = step(st, x)  # converged estimate
        y = np.asarray(y)[0]
        off = ~duty
        p_off_in = np.mean(np.abs(x[0][off]) ** 2)
        p_off_out = np.mean(np.abs(y[off]) ** 2)
        assert 10 * np.log10(p_off_in / p_off_out) > 5.0, "noise in gaps not reduced"
        on = duty
        c = np.abs(np.vdot(sig[on], y[on])) / (np.linalg.norm(sig[on]) * np.linalg.norm(y[on]) + 1e-12)
        assert c > 0.9, f"burst signal damaged: corr {c:.2f}"


class TestVad:
    def test_flags_activity(self, rng):
        fs = 48_000.0
        n = 256 * 32
        x = 0.01 * (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))).astype(np.complex64)
        t = np.arange(n // 2) / fs
        x[0, : n // 2] += (0.5 * np.exp(2j * np.pi * 800.0 * t)).astype(np.complex64)
        flags = np.asarray(jrun(lambda x: vad(x, nfft=256), x))
        F = flags.shape[1]
        assert flags[0, : F // 2].mean() > 0.8
        assert flags[0, F // 2:].mean() < 0.2


class TestChainIntegration:
    def test_chain_with_nb_and_notch(self):
        """NB + auto-notch are transparent to a clean VOICE signal. (A
        steady two-tone fixture would be notched — an auto-notch kills
        persistent tones by design, like the reference's LMS notch.)"""
        def run(cfg):
            chain = RxChain(cfg)
            n = 8 * chain.min_block
            voice = FX.voicelike_audio(48_000.0, n // 4)
            iq, truth = FX.ssb_capture(FS, n, 37_000.0, audio=voice)
            words = jnp.asarray([nco.freq_word(37_000.0, FS)], jnp.int32)
            mode = jnp.asarray([demod_op.SSB], jnp.int32)
            _, audio, _ = jrun(lambda iq, w, m: chain.step(
                chain.init_state(1), iq, w, m),
                iq[None, :].astype(np.complex64), words, mode)
            return audio_snr_db(truth, np.asarray(audio)[0])

        base = run(RxConfig(channels=1))
        guarded = run(RxConfig(channels=1, nb_enabled=True, notch_enabled=True))
        # transparency: fighters cost < 2 dB on clean voice (absolute SNR is
        # dominated by AGC syllabic wander, identical in both runs)
        assert guarded > base - 2.0, f"baseline {base:.1f} vs guarded {guarded:.1f}"
        assert guarded > 8.0

    def test_chain_with_nr_runs(self):
        """NR chain compiles, streams, and yields finite audio. (Minimum-
        statistics NR attenuates continuous tones — by design voice with
        pauses is its target — so no SNR bound on a continuous fixture.)"""
        cfg = RxConfig(channels=1, nr_enabled=True)
        chain = RxChain(cfg)
        iq, _ = FX.ssb_capture(FS, 4 * chain.min_block, 37_000.0)
        words = jnp.asarray([nco.freq_word(37_000.0, FS)], jnp.int32)
        mode = jnp.asarray([demod_op.SSB], jnp.int32)
        st = jrun(lambda: chain.init_state(1))
        step = jwrap(chain.step)
        for b in np.split(iq, 2):
            st, audio, _ = step(st, b[None, :].astype(np.complex64), words, mode)
        assert np.all(np.isfinite(np.asarray(audio)))


class TestVadGating:
    """VAD gates SpectralNR's noise-estimate update (VERDICT r2 ask #7,
    `[U:vad.c]` semantics: speech must not be learned as noise)."""

    def test_all_voice_freezes_estimate(self, rng):
        nr = SpectralNR(nfft=128)
        est = 0.02 * np.ones((1, 128), np.float32)
        x = (np.exp(2j * np.pi * 0.1 * np.arange(1024))
             ).astype(np.complex64)[None, :]
        voice_all = np.ones((1, 8), bool)
        _, est_frozen = jrun(nr, est, x, voice=voice_all)
        np.testing.assert_array_equal(np.asarray(est_frozen), np.asarray(est))
        # ungated on the same input: the estimate moves (grows by `up` or
        # re-minimizes) — proves the freeze came from the gate
        _, est_free = jrun(nr, est, x)
        assert not np.array_equal(np.asarray(est_free), np.asarray(est))

    def test_voice_frames_excluded_from_min(self, rng):
        """A loud voice burst in half the frames must not drag the noise
        estimate UP (ungated min-statistics is immune to that too), and —
        the real hazard — a QUIET voice pause learned correctly while the
        estimate ignores flagged frames whose floor is lower."""
        nr = SpectralNR(nfft=128)
        est0 = jrun(lambda: nr.init_state(1))
        n = 8 * 128
        noise = (0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
                 ).astype(np.complex64)
        x = noise.copy()
        x[: n // 2] += np.exp(2j * np.pi * 0.11 * np.arange(n // 2)).astype(np.complex64)
        voice = np.r_[np.ones(4, bool), np.zeros(4, bool)][None, :]
        _, est_gated = jrun(nr, est0, x[None, :], voice=voice)
        # gated estimate ~ noise-only level IN AGGREGATE (per-bin min over 4
        # vs 8 frames differs by sampling noise; compare the mean level) and,
        # the actual hazard, the carrier bin must NOT have been learned
        _, est_noise = jrun(nr, est0, noise[None, :])
        g, n_ = np.asarray(est_gated), np.asarray(est_noise)
        assert 0.5 < g.mean() / n_.mean() < 3.0, (g.mean(), n_.mean())
        carrier_bin = int(round(0.11 * 128))
        assert g[0, carrier_bin] < 0.1 * 128 * 1.0  # << the burst magnitude

    def test_chain_emits_vad_and_runs(self, rng):
        cfg = RxConfig(channels=2, nr_enabled=True, vad_enabled=True)
        chain = RxChain(cfg)
        n = 2 * chain.min_block
        iq, _ = FX.ssb_capture(FS, n, 37_000.0)
        words = jnp.asarray(nco.freq_word(np.asarray([37_000.0, -20_000.0]), FS))
        mode = jnp.asarray([demod_op.SSB, demod_op.AM], jnp.int32)
        st = jrun(lambda: chain.init_state(2))
        assert "vad" in st and np.asarray(st["vad"]).shape == (2,)
        step = jwrap(chain.step)
        iq2 = np.broadcast_to(iq, (2, n))
        for b in np.split(iq2, 2, axis=-1):
            st, audio, aux = step(st, b.astype(np.complex64), words, mode)
        assert "vad_active" in aux and aux["vad_active"].dtype == bool
        assert aux["vad_active"].shape[0] == 2
        assert np.all(np.isfinite(np.asarray(audio)))
