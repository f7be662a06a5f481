"""CW + RTTY decoders: encode -> (optionally through the RX chain) -> decode."""

import numpy as np

from radioframe.ops.decoders import (
    cw_decode,
    cw_encode_envelope,
    rtty_decode,
    rtty_encode,
)

FS = 48_000.0


class TestCW:
    def test_clean_loopback(self):
        env = cw_encode_envelope("CQ CQ DE W1AW", FS, wpm=25.0)
        t = np.arange(len(env)) / FS
        audio = env * np.sin(2 * np.pi * 600.0 * t)
        got = cw_decode(audio, FS, 600.0)
        assert got == "CQ CQ DE W1AW", got

    def test_noisy(self, rng):
        env = cw_encode_envelope("TEST", FS, wpm=20.0)
        t = np.arange(len(env)) / FS
        audio = env * np.sin(2 * np.pi * 600.0 * t) + 0.2 * rng.standard_normal(len(env))
        assert cw_decode(audio, FS, 600.0) == "TEST"

    def test_silence_returns_empty(self, rng):
        audio = 0.01 * rng.standard_normal(48_000)
        assert cw_decode(audio, FS, 600.0) == ""


class TestRTTY:
    def test_clean_loopback(self):
        audio = rtty_encode("RYRY CQ TEST", FS)
        got = rtty_decode(audio, FS)
        assert got == "RYRY CQ TEST", got

    def test_noisy(self, rng):
        audio = rtty_encode("HELLO", FS) + 0.3 * rng.standard_normal(len(rtty_encode("HELLO", FS)))
        assert rtty_decode(audio, FS) == "HELLO"


class TestThroughRadio:
    def test_cw_over_the_air(self):
        """CW keyed RF at +7 kHz through the full RX chain -> decoded text."""
        import jax.numpy as jnp

        from radioframe.api.radio import Radio
        from radioframe.core.config import RxConfig

        fs_iq = 192_000.0
        env = cw_encode_envelope("CQ DX", fs_iq, wpm=25.0)
        n = ((len(env) // 8192) + 1) * 8192
        env = np.pad(env, (0, n - len(env)))
        t = np.arange(n) / fs_iq
        iq = (env * np.exp(2j * np.pi * 7_000.0 * t)).astype(np.complex64)
        r = Radio(RxConfig(channels=1))
        r.tune(0, 7_000.0)
        r.set_mode(0, "cw")
        audio = r.process(iq)[0]
        got = cw_decode(audio, 48_000.0, r.config.cw_tone_hz)
        assert got == "CQ DX", got
