"""Pallas kernel parity (SURVEY.md §4.2 #6): interpret-mode on CPU vs the
pure-XLA FirDecimator / golden model. On real TPU (RADIOFRAME_TEST_TPU=1)
the same tests compile the kernel for hardware."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radioframe.golden import model as G
from radioframe.kernels.polyphase_fir import PallasFirDecimator
from radioframe.ops import filter_design as FD
from radioframe.ops.fir import FirDecimator

INTERPRET = not os.environ.get("RADIOFRAME_TEST_TPU")


def _iq(rng, C, T):
    return (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64)


class TestPallasPolyphaseFir:
    @pytest.mark.parametrize("R,L,C,T", [
        (4, 64, 8, 1024),     # L multiple of R
        (4, 63, 8, 1024),     # L needs padding
        (2, 129, 3, 512),     # odd taps, odd channels (lane pad)
        (8, 96, 128, 2048),   # full lane width
        (1, 33, 5, 256),      # no decimation
    ])
    def test_matches_xla_decimator(self, rng, R, L, C, T):
        taps = FD.lowpass_taps(L, 0.4 / R, 1.0)
        ref_op = FirDecimator(taps, R)
        pal_op = PallasFirDecimator(taps, R, interpret=INTERPRET)
        x = _iq(rng, C, T)
        ref, ref_tail = ref_op(ref_op.init_state(C), jnp.asarray(x))
        got, got_tail = pal_op(pal_op.init_state(C), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_streaming_state(self, rng):
        taps = FD.lowpass_taps(64, 0.1, 1.0)
        op = PallasFirDecimator(taps, 4, interpret=INTERPRET)
        x = _iq(rng, 4, 2048)
        whole, _ = op(op.init_state(4), jnp.asarray(x))
        st = op.init_state(4)
        outs = []
        for b in np.split(x, 4, axis=-1):
            y, st = op(st, jnp.asarray(b))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, -1), np.asarray(whole), atol=1e-6)

    def test_full_chain_parity(self, rng):
        """RxChain with use_pallas_fir reproduces the XLA-conv chain."""
        import radioframe.kernels.polyphase_fir as pk
        from radioframe.core.config import RxConfig
        from radioframe.ops import demod as demod_op
        from radioframe.ops import nco
        from radioframe.pipelines.rx_chain import RxChain

        if INTERPRET:  # force interpret mode inside the chain build
            orig = pk.PallasFirDecimator.__init__

            def patched(self, taps, R=1, interpret=True):
                orig(self, taps, R, interpret=True)

            pk.PallasFirDecimator.__init__ = patched
        try:
            iq = _iq(rng, 1, 16384)
            words = jnp.asarray([nco.freq_word(37e3, 192e3)], jnp.int32)
            mode = jnp.asarray([demod_op.SSB], jnp.int32)
            outs = {}
            for flag in (False, True):
                chain = RxChain(RxConfig(channels=1, use_pallas_fir=flag))
                st = chain.init_state(1)
                _, audio, _ = jax.jit(chain.step)(st, jnp.asarray(iq), words, mode)
                outs[flag] = np.asarray(audio)
            # ignore the AGC warm-up amplification window
            np.testing.assert_allclose(outs[True][:, 512:], outs[False][:, 512:], atol=1e-4)
        finally:
            if INTERPRET:
                pk.PallasFirDecimator.__init__ = orig

    def test_vs_golden(self, rng):
        taps = FD.lowpass_taps(48, 0.1, 1.0)
        op = PallasFirDecimator(taps, 4, interpret=INTERPRET)
        x = _iq(rng, 2, 512)
        y, _ = op(op.init_state(2), jnp.asarray(x))
        for c in range(2):
            ref, _ = G.fir_decimate(x[c].astype(np.complex128), taps, 4)
            np.testing.assert_allclose(np.asarray(y)[c], ref, atol=2e-5)
