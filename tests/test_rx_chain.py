"""Acceptance configs 1 & 2 (BASELINE.json):
  1. single-channel SSB RX 192 kHz -> 48 kHz audio, fp32
  2. multi-mode demod bank (SSB/CW/AM/NFM) with OLS FFT filtering
scored by audio SNR vs truth, and vs an identically-composed golden chain
(<= 1 dB SNR delta)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import jrun, jwrap
from conftest import _ON_CPU as _CPU

from radioframe.core.config import CicStage, FirStage, RxConfig
from radioframe.diag.metrics import audio_snr_db
from radioframe.golden import model as G
from radioframe.io import fixtures as FX
from radioframe.ops import demod as demod_op
from radioframe.ops import filter_design as FD
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain

FS = 192_000.0


def golden_chain(chain: RxChain, iq, freq_hz, mode_name):
    """Golden-op composition mirroring RxChain.step exactly (fp64)."""
    cfg = chain.cfg
    word = nco.freq_word(freq_hz, cfg.fs_in)
    fq = nco.word_to_freq(word, cfg.fs_in)
    x, _ = G.nco_mix(iq.astype(np.complex128), fq, cfg.fs_in)
    fs = cfg.fs_in
    for dec in chain.decimators:
        taps = (dec._rhs[0, 0] + 1j * dec._rhs[1, 0]) if dec.complex_taps else dec._rhs[0, 0]
        taps = np.asarray(taps)[::-1]
        x, _ = G.fir_decimate(x, taps, dec.R)
        fs /= dec.R
    mf = cfg.mode_filters
    k = demod_op.MODE_NAMES[mode_name]
    taps_k = [
        FD.complex_bandpass_taps(mf.numtaps, mf.ssb_lo, mf.ssb_hi, fs),
        FD.complex_bandpass_taps(mf.numtaps, -mf.cw_halfwidth, mf.cw_halfwidth, fs),
        FD.complex_bandpass_taps(mf.numtaps, -mf.am_halfwidth, mf.am_halfwidth, fs),
        FD.complex_bandpass_taps(mf.numtaps, -mf.nfm_halfwidth, mf.nfm_halfwidth, fs),
    ][k]
    x, _ = G.ols_filter(x, taps_k)
    if mode_name == "ssb":
        audio = G.demod_ssb(x)
    elif mode_name == "cw":
        tone_q = nco.word_to_freq(chain.cw_tone_word, fs)
        audio, _ = G.demod_cw(x, tone_q, fs)  # both mix up by +tone
    elif mode_name == "am":
        audio, _ = G.demod_am(x)
    else:
        audio, _ = G.demod_nfm(x, fs, cfg.nfm_deviation_hz)
    if mode_name != "nfm":  # chain bypasses AGC for FM
        k = demod_op.MODE_NAMES[mode_name]
        audio, _, _ = G.agc_full(
            audio, float(chain.agc_bank.release[k]), float(chain.agc_bank.alpha[k]),
            chain.agc_bank.distinct_W[int(chain.agc_bank.win_index[k])] - 1,
            float(chain.agc_bank.target[k]), float(chain.agc_bank.max_gain[k]))
    return audio


class TestConfig1SSB:
    def test_single_channel_ssb(self):
        iq, truth = FX.ssb_capture(FS, 96 * 2048, 37_000.0)
        cfg = RxConfig(channels=1)
        chain = RxChain(cfg)
        words = jnp.asarray([nco.freq_word(37_000.0, FS)], jnp.int32)
        mode = jnp.asarray([demod_op.SSB], jnp.int32)
        st, audio, aux = jrun(lambda iq, w, m: chain.step(
            chain.init_state(1), iq, w, m),
            iq[None, :].astype(np.complex64), words, mode)
        audio = np.asarray(audio)[0]
        snr_jax = audio_snr_db(truth, audio)
        golden = golden_chain(chain, iq, 37_000.0, "ssb")
        snr_gold = audio_snr_db(truth, golden)
        assert snr_jax > 30.0, f"jax SSB SNR {snr_jax:.1f}"
        assert abs(snr_gold - snr_jax) <= 1.0, f"golden {snr_gold:.1f} vs jax {snr_jax:.1f}"
        # direct agreement between implementations
        assert audio_snr_db(golden, audio) > 35.0

    def test_streaming_matches_oneshot(self):
        iq, _ = FX.ssb_capture(FS, 8 * chain_min_block(), 37_000.0)
        cfg = RxConfig(channels=1)
        chain = RxChain(cfg)
        words = jnp.asarray([nco.freq_word(37_000.0, FS)], jnp.int32)
        mode = jnp.asarray([demod_op.SSB], jnp.int32)
        step = jwrap(chain.step)
        st = jrun(lambda: chain.init_state(1))
        _, whole, _ = step(st, iq[None, :].astype(np.complex64), words, mode)
        st = jrun(lambda: chain.init_state(1))
        outs = []
        for blk in np.split(iq, 8):
            st, a, _ = step(st, blk[None, :].astype(np.complex64), words, mode)
            outs.append(np.asarray(a))
        got = np.concatenate(outs, axis=-1)
        whole = np.asarray(whole)
        # warm-up window: AGC gain sits at ~max_gain over near-silence, so fp32
        # noise (~2e-7) is amplified ~1e4x; outputs converge once signal arrives
        np.testing.assert_allclose(got[:, 512:], whole[:, 512:], atol=2e-5)
        np.testing.assert_allclose(got, whole, atol=5e-3)


def chain_min_block():
    return RxChain(RxConfig(channels=1)).min_block


class TestConfig2ModeBank:
    def test_four_modes_one_wideband_capture(self):
        """One wideband stream; 4 channels tuned to 4 signals, 4 modes at once."""
        n = 96 * 2048  # ~1.02 s, multiple of chain min_block
        ssb_iq, ssb_truth = FX.ssb_capture(FS, n, 37_000.0)
        am_iq, am_truth = FX.am_capture(FS, n, 20_000.0)
        nfm_iq, nfm_truth = FX.nfm_capture(FS, n, -15_000.0)
        cw_iq, cw_key = FX.cw_capture(FS, n, 70_000.0)
        wideband = (ssb_iq + am_iq + nfm_iq + cw_iq).astype(np.complex64)

        cfg = RxConfig(channels=4)
        chain = RxChain(cfg)
        words = jnp.asarray(nco.freq_word([37_000.0, 70_000.0, 20_000.0, -15_000.0], FS))
        mode = jnp.asarray([demod_op.SSB, demod_op.CW, demod_op.AM, demod_op.NFM], jnp.int32)
        # shared wideband input broadcast across channels
        st, audio, _ = jrun(lambda iq, w, m: chain.step(
            chain.init_state(4), iq, w, m), wideband[None, :], words, mode)
        audio = np.asarray(audio)
        # score steady state: the AM dc-blocker turn-on transient pumps the
        # AGC (gain recovers over release_s=0.5 s — correct behavior, but a
        # global-gain SNR metric reads the ramp as error)
        settle = 32 * 1024  # ~0.68 s at 48 kHz
        snr_ssb = audio_snr_db(ssb_truth, audio[0])
        snr_am = audio_snr_db(am_truth[settle:], audio[2][settle:], trim=1024)
        snr_nfm = audio_snr_db(nfm_truth[settle:], audio[3][settle:], trim=1024)
        assert snr_ssb > 25.0, f"SSB {snr_ssb:.1f}"
        assert snr_am > 20.0, f"AM {snr_am:.1f}"
        assert snr_nfm > 20.0, f"NFM {snr_nfm:.1f}"
        # CW: keyed tone present at the beat frequency; check envelope corr
        env = np.abs(audio[1])
        lp = FD.lowpass_taps(65, 100.0, 48_000.0)
        env_s, _ = G.fir_decimate(env.astype(np.complex128), lp, 1)
        key48 = cw_key[::4][: len(env_s)]
        c = np.corrcoef(np.real(env_s), key48)[0, 1]
        assert c > 0.85, f"CW envelope correlation {c:.3f}"


class TestLSB:
    def test_lsb_receive(self):
        """LSB signal at -noise... generate LSB capture (conj of USB baseband)."""
        import numpy as np

        n = 96 * 2048
        iq_usb, truth = FX.ssb_capture(FS, n, 0.0)  # USB at 0 offset
        # LSB capture: conjugate flips the sideband; re-center at +30 kHz
        lsb_base = np.conj(iq_usb)
        t = np.arange(n) / FS
        iq = (lsb_base * np.exp(2j * np.pi * 30_000.0 * t)).astype(np.complex64)
        chain = RxChain(RxConfig(channels=1))
        words = jnp.asarray([nco.freq_word(30_000.0, FS)], jnp.int32)
        mode = jnp.asarray([demod_op.LSB], jnp.int32)
        _, audio, _ = jrun(lambda iq, w, m: chain.step(
            chain.init_state(1), iq, w, m), iq[None, :], words, mode)
        snr = audio_snr_db(truth, np.asarray(audio)[0])
        assert snr > 25.0, f"LSB SNR {snr:.1f} dB"

    def test_tx_lsb_spectrum_is_mirrored(self):
        from radioframe.core.config import TxConfig
        from radioframe.pipelines.tx_chain import TxChain

        n = 2048 * 4
        audio = FX.voicelike_audio(48_000.0, n)
        tx = TxChain(TxConfig(channels=1, compressor_max_gain=1.0))
        for m, expect_side in (("ssb", +1), ("lsb", -1)):
            w = jnp.asarray([0], jnp.int32)
            mm = jnp.asarray([demod_op.MODE_NAMES[m]], jnp.int32)
            _, iq = jrun(lambda a, w, m: tx.step(tx.init_state(1), a, w, m),
                         audio[None, :].astype(np.float32), w, mm)
            X = np.fft.fft(np.asarray(iq)[0])
            f = np.fft.fftfreq(len(X), 1 / 192_000.0)
            pos = np.sum(np.abs(X[f > 100]) ** 2)
            neg = np.sum(np.abs(X[f < -100]) ** 2)
            ratio = (pos / neg) if expect_side > 0 else (neg / pos)
            assert 10 * np.log10(ratio) > 30.0, (m, ratio)


class TestSamSquelch:
    def test_sam_tracks_mistuned_am(self):
        """SAM demodulates a 120 Hz-mistuned AM signal coherently AND its
        carrier estimator reports the tuning error (the S-meter/snap input)."""
        n = 96 * 2048
        iq, truth = FX.am_capture(FS, n, 20_000.0)
        chain = RxChain(RxConfig(channels=1))
        words = jnp.asarray([nco.freq_word(20_120.0, FS)], jnp.int32)  # 120 Hz off
        mode = jnp.asarray([demod_op.SAM], jnp.int32)
        st, audio, _ = jrun(lambda iq, w, m: chain.step(
            chain.init_state(1), iq, w, m),
            iq[None, :].astype(np.complex64), words, mode)
        audio = np.asarray(audio)
        settle = 32 * 1024
        snr_sam = audio_snr_db(truth[settle:], audio[0][settle:], trim=1024)
        assert snr_sam > 20.0, f"SAM {snr_sam:.1f} dB"
        # carrier estimator: residual = -120 Hz at the 48 kHz audio rate
        w_est = float(np.asarray(st["demod"]["sam_carrier"])[1, 0])
        w_true = -2 * np.pi * 120.0 / 48_000.0
        assert abs(w_est - w_true) < 0.1 * abs(w_true), (w_est, w_true)

    def test_squelch_gates_noise(self):
        """No-signal NFM channel mutes with squelch; strong signal opens it."""
        n = 96 * 2048
        cfg = RxConfig(channels=1, squelch_enabled=True, squelch_threshold=0.5)
        chain = RxChain(cfg)
        words = jnp.asarray([nco.freq_word(-15_000.0, FS)], jnp.int32)
        mode = jnp.asarray([demod_op.NFM], jnp.int32)
        rng = np.random.default_rng(3)
        noise = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.1
        st = jrun(lambda: chain.init_state(1))
        step = jwrap(chain.step)
        # two noise blocks: the squelch estimate converges, audio mutes
        for _ in range(3):
            st, audio, _ = step(st, noise[None, :], words, mode)
        assert np.mean(np.abs(np.asarray(audio))) < 1e-6, "squelch failed to mute noise"
        # now a real NFM signal opens the squelch (estimate decays over blocks)
        iq, truth = FX.nfm_capture(FS, n, -15_000.0)
        for _ in range(6):
            st, audio, _ = step(st, iq[None, :], words, mode)
        assert np.mean(np.abs(np.asarray(audio))) > 0.05, "squelch failed to open"


class TestEnabledModesRx:
    def test_subset_matches_full_bank(self, rng):
        """RxConfig.enabled_modes: identical audio for channels on enabled
        modes, sharded variant included (static gating, no control flow)."""
        import jax
        from jax import numpy as jnp

        from radioframe.shard.rx import ShardedRxChain

        C = 4
        full_cfg = RxConfig(channels=C, ols_hop=512)
        sub_cfg = RxConfig(channels=C, ols_hop=512, enabled_modes=(0, 1, 2, 3))
        mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
        words = jnp.asarray(nco.freq_word(np.linspace(-50e3, 50e3, C), FS))
        chain_f = RxChain(full_cfg)
        T = 2 * chain_f.min_block
        iq = jnp.asarray((rng.standard_normal((C, T))
                          + 1j * rng.standard_normal((C, T))).astype(np.complex64))
        outs = []
        for cfg in (full_cfg, sub_cfg):
            ch = RxChain(cfg)
            st, audio, _ = jax.jit(ch.step)(ch.init_state(C), iq, words, mode)
            outs.append(np.asarray(audio))
        np.testing.assert_array_equal(outs[0], outs[1])
        # sharded subset == unsharded subset
        ch = RxChain(sub_cfg)
        mesh = jax.make_mesh((2, 2), ("channel", "time"), devices=jax.devices()[:4])
        sh = ShardedRxChain(ch, mesh)
        st2, audio_sh, _ = jax.jit(sh.step)(ch.init_state(C), iq, words, mode)
        np.testing.assert_allclose(np.asarray(audio_sh)[:, 512:],
                                   outs[1][:, 512:], atol=2e-4)


class TestFusedBackend:
    """kernels/ols_demod.py — the one-kernel audio back end — matches the
    dense OLS + demod bank + AGC path, streaming (r4).

    NFM channels get a proper FM carrier (plus light noise) so the
    discriminator vector stays well-conditioned: the angle of a near-zero
    vector is noise in ANY implementation, and random-noise input drives
    |x[n] conj(x[n-1])| through zero (measured: masked on |d| > 1e-2 of
    median the paths agree to 1.3e-4; the unmasked 'error' is conditioning,
    not math)."""

    def _cfgs(self, C, attack):
        from radioframe.core.config import AgcConfig

        agc_modes = ((AgcConfig(release_s=0.5, attack_s=0.002 if attack else 0.0),)
                     * 6)
        base = dict(fs_in=1_536_000.0, channels=C,
                    stages=(CicStage(R=8, N=4),
                            FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
                    ols_hop=512, enabled_modes=(0, 1, 2, 3),
                    agc_modes=agc_modes)
        return (RxConfig(**base), RxConfig(**base, fuse_backend=True))

    def _iq_fixture(self, rng, C, T, fs):
        # structured input: per-channel tones (FM-modulated for NFM rows)
        # + noise floor, so every demod sees a well-conditioned signal
        t = np.arange(T) / fs
        iq = np.zeros((C, T), np.complex64)
        for c in range(C):
            if c % 4 == 3:  # NFM row: 1 kHz audio tone at 2 kHz deviation
                phase = 2 * np.pi * np.cumsum(
                    2000.0 * np.sin(2 * np.pi * 1000.0 * t)) / fs
                iq[c] = np.exp(1j * phase)
            else:
                iq[c] = np.exp(2j * np.pi * (1000.0 + 37.0 * c) * t)
        iq += 0.05 * (rng.standard_normal((C, T))
                      + 1j * rng.standard_normal((C, T)))
        return iq.astype(np.complex64)

    @pytest.mark.parametrize("attack", [False, True])
    def test_matches_dense_streaming(self, rng, attack):
        C = 8 if _CPU else 128  # compiled kernel needs full lane tiles
        cfg_d, cfg_f = self._cfgs(C, attack)
        dense, fused = RxChain(cfg_d), RxChain(cfg_f)
        assert fused.backend_kernel is not None
        if attack:
            assert fused.backend_kernel.attack_alphas
        T = dense.min_block
        words = jnp.asarray(nco.freq_word(np.zeros(C), cfg_d.fs_in))
        mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
        iq = self._iq_fixture(rng, C, 3 * T, cfg_d.fs_in)
        st_d = jrun(lambda: dense.init_state(C))
        st_f = jrun(lambda: fused.init_state(C))
        step_d, step_f = jwrap(dense.step), jwrap(fused.step)
        outs = [[], []]
        for i, b in enumerate(np.split(np.asarray(iq), 3, axis=-1)):
            st_d, a_d, x_d = step_d(st_d, b, words, mode)
            st_f, a_f, x_f = step_f(st_f, b, words, mode)
            if i == 0:
                continue  # filter/AGC warm-up: near-zero signals x max_gain
                # amplify fp noise (same skip as the other chain tests)
            outs[0].append(np.asarray(a_d))
            outs[1].append(np.asarray(a_f))
        ref = np.concatenate(outs[0], axis=-1)
        got = np.concatenate(outs[1], axis=-1)
        period = cfg_d.fs_audio / cfg_d.nfm_deviation_hz
        d = got - ref
        d = d - np.round(d / period) * period  # FM branch flips wrap
        np.testing.assert_allclose(d, 0.0, atol=3e-4)
        # streaming state parity across the formulations. NFM rows are
        # excluded from the env compare: their AGC envelope is |audio| of
        # the UNWRAPPED discriminator output, so a +-pi atan2 branch flip
        # (same instantaneous frequency — the audio compare wraps it by
        # the period above) legitimately shifts which sample the max-decay
        # latched; the envelope is unused for NFM output (FM bypasses AGC)
        keep = np.asarray(mode) != 3
        np.testing.assert_allclose(np.asarray(st_f["agc"]["env"])[keep],
                                   np.asarray(st_d["agc"]["env"])[keep],
                                   atol=3e-4, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(st_f["demod"]["cw_phase"]),
                                      np.asarray(st_d["demod"]["cw_phase"]))
        np.testing.assert_allclose(np.asarray(st_f["bpf"]),
                                   np.asarray(st_d["bpf"]), atol=1e-5)

    def test_guards(self):
        from radioframe.core.config import RxConfig as RC

        base = dict(fs_in=1_536_000.0, channels=4,
                    stages=(CicStage(R=8, N=4),
                            FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
                    ols_hop=512)
        with pytest.raises(AssertionError, match="enabled_modes"):
            RxChain(RC(**base, fuse_backend=True))  # SAM implicitly present
        with pytest.raises(AssertionError, match="squelch|interference"):
            RxChain(RC(**base, fuse_backend=True, enabled_modes=(0, 1),
                       squelch_enabled=True))
