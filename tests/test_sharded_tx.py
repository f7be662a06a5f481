"""Sharded TX chain == unsharded TX chain on faked meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radioframe.core.config import TxConfig
from radioframe.io import fixtures as FX
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.pipelines.tx_chain import TxChain
from radioframe.shard.tx import ShardedTxChain

FS = 192_000.0


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4), (4, 2)])
def test_sharded_tx_matches_unsharded(mesh_shape):
    C = 4
    chain = TxChain(TxConfig(channels=C))
    devs = jax.devices()[: mesh_shape[0] * mesh_shape[1]]
    mesh = jax.make_mesh(mesh_shape, ("channel", "time"), devices=devs)
    sharded = ShardedTxChain(chain, mesh)

    Ta = 4 * 2048
    audio = np.stack([FX.voicelike_audio(48_000.0, Ta, seed=i) for i in range(C)]).astype(np.float32)
    words = jnp.asarray(nco.freq_word(np.linspace(-60e3, 60e3, C), FS))
    mode = jnp.asarray([demod_op.SSB, demod_op.CW, demod_op.AM, demod_op.NFM], jnp.int32)

    st = chain.init_state(C)
    ref_st, ref_iq = jax.jit(chain.step)(st, jnp.asarray(audio), words, mode)
    st2 = chain.init_state(C)
    got_st, got_iq = jax.jit(sharded.step)(st2, jnp.asarray(audio), words, mode)
    np.testing.assert_allclose(np.asarray(got_iq), np.asarray(ref_iq), atol=5e-4)
    # phase state compares as phasors (mod-2pi wraparound)
    dphi = np.abs(np.exp(1j * np.asarray(got_st["fm_phase"]))
                  - np.exp(1j * np.asarray(ref_st["fm_phase"])))
    assert dphi.max() < 2e-3, dphi
    for a, b in zip(got_st["interp"], ref_st["interp"]):
        # tails are modulator outputs: scan reassociation gives ~1e-5 fp noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_sharded_tx_streaming():
    C = 2
    chain = TxChain(TxConfig(channels=C))
    mesh = jax.make_mesh((1, 4), ("channel", "time"), devices=jax.devices()[:4])
    sharded = ShardedTxChain(chain, mesh)
    Ta = 4 * 2048
    audio = np.stack([FX.voicelike_audio(48_000.0, 2 * Ta, seed=i) for i in range(C)]).astype(np.float32)
    words = jnp.asarray(nco.freq_word([10e3, -20e3], FS))
    mode = jnp.asarray([demod_op.SSB, demod_op.NFM], jnp.int32)

    st = chain.init_state(C)
    ref = []
    for b in np.split(audio, 2, axis=-1):
        st, iq = jax.jit(chain.step)(st, jnp.asarray(b), words, mode)
        ref.append(np.asarray(iq))
    ref = np.concatenate(ref, axis=-1)
    st = chain.init_state(C)
    got = []
    sstep = jax.jit(sharded.step)
    for b in np.split(audio, 2, axis=-1):
        st, iq = sstep(st, jnp.asarray(b), words, mode)
        got.append(np.asarray(iq))
    got = np.concatenate(got, axis=-1)
    # 5e-4: fp-reassociation between the sharded halo path and the
    # unsharded polyphase accumulation on ~unit-amplitude IQ (matches the
    # single-block bound above)
    np.testing.assert_allclose(got, ref, atol=5e-4)
