"""Preset chains: ADC-rate (61.44 Msps, R=1280) DDC demodulates correctly."""

import jax
import jax.numpy as jnp
import numpy as np
from conftest import jrun

from radioframe.core import presets
from radioframe.diag.metrics import audio_snr_db
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain


def test_adc_rate_ddc_ssb():
    cfg = presets.adc_61m44(channels=1)
    chain = RxChain(cfg)
    assert cfg.decim == 1280 and cfg.fs_audio == 48_000.0
    fs = cfg.fs_in
    # SSB-like: a 1 kHz tone as USB at +12.345 MHz carrier offset
    T = chain.min_block  # one block at ADC rate
    t = np.arange(T) / fs
    tone = np.exp(2j * np.pi * (12_345_000.0 + 1000.0) * t).astype(np.complex64)
    words = jnp.asarray([nco.freq_word(12_345_000.0, fs)], jnp.int32)
    mode = jnp.asarray([demod_op.SSB], jnp.int32)
    st, audio, _ = jrun(lambda iq, w, m: chain.step(chain.init_state(1),
                                                     iq, w, m),
                        tone[None, :], words, mode)
    audio = np.asarray(audio)[0]
    ref = np.cos(2 * np.pi * 1000.0 * np.arange(len(audio)) / 48_000.0)
    snr = audio_snr_db(ref, audio, trim=len(audio) // 8)
    assert snr > 30.0, f"ADC-rate DDC tone SNR {snr:.1f} dB"


def test_wideband_preset_builds():
    chain = RxChain(presets.wideband_1536k(channels=8))
    assert chain.cfg.decim == 32
    assert chain.cfg.fs_audio == 48_000.0


def test_adc_rate_sharded_matches_unsharded():
    """R=1280 chain under time sharding: multi-stage halos at three rates."""
    import jax
    from radioframe.shard.rx import ShardedRxChain

    cfg = presets.adc_61m44(channels=2)
    chain = RxChain(cfg)
    mesh = jax.make_mesh((1, 4), ("channel", "time"), devices=jax.devices()[:4])
    sharded = ShardedRxChain(chain, mesh)
    T = 4 * chain.min_block
    fs = cfg.fs_in
    t = np.arange(T) / fs
    tone = np.exp(2j * np.pi * (5_000_000.0 + 700.0) * t).astype(np.complex64)
    iq = np.stack([tone, 0.5 * tone])
    words = jnp.asarray(nco.freq_word([5_000_000.0, 5_000_000.0], fs))
    mode = jnp.asarray([demod_op.SSB, demod_op.SSB], jnp.int32)
    st = chain.init_state(2)
    _, ref, _ = jax.jit(chain.step)(st, jnp.asarray(iq), words, mode)
    st2 = chain.init_state(2)
    _, got, _ = jax.jit(sharded.step)(st2, jnp.asarray(iq), words, mode)
    np.testing.assert_allclose(np.asarray(got)[:, 64:], np.asarray(ref)[:, 64:], atol=5e-4)
