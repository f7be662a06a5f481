"""Native IQ transport: conversion parity, ring buffer semantics, threading."""

import threading

import numpy as np

from radioframe.native import HAVE_NATIVE, RingBuffer, c64_to_iq_i16, iq_i16_to_c64


def test_native_built():
    # the image ships gcc; the native path must actually be active here
    assert HAVE_NATIVE


def test_i16_to_c64_parity(rng):
    pcm = rng.integers(-32768, 32767, 4096, dtype=np.int16)
    got = iq_i16_to_c64(pcm)
    # C multiplies by the reciprocal; match that (1-ulp vs division)
    ref = (pcm.astype(np.float32) * np.float32(1.0 / 32767.0)).view(np.complex64)
    np.testing.assert_array_equal(got, ref)


def test_c64_to_i16_saturates(rng):
    iq = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
    iq[0] = 10.0 + 10.0j  # overdrive
    out = c64_to_iq_i16(iq)
    assert out[0] == 32767 and out[1] == 32767
    ref = np.clip(iq.view(np.float32) * 32767.0, -32768, 32767).astype(np.int16)
    np.testing.assert_allclose(out, ref, atol=1)


def test_ringbuffer_roundtrip(rng):
    rb = RingBuffer(1 << 16)
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex64)
    assert rb.write(x)
    assert rb.fill == x.nbytes
    y = rb.read(x.nbytes)
    np.testing.assert_array_equal(y, x)
    assert rb.read(8) is None  # empty


def test_ringbuffer_rejects_overflow():
    rb = RingBuffer(1 << 12)  # 4 KiB
    big = np.zeros(1024, np.complex64)  # 8 KiB
    assert not rb.write(big)


def test_ringbuffer_threaded_stream(rng):
    """Producer thread (the 'ISR') feeds blocks; consumer drains in order."""
    rb = RingBuffer(1 << 18)
    blocks = [(rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
              for _ in range(64)]

    def producer():
        for b in blocks:
            while not rb.write(b):
                pass

    t = threading.Thread(target=producer)
    t.start()
    got = []
    while len(got) < 64:
        y = rb.read(512 * 8)
        if y is not None:
            got.append(y)
    t.join()
    np.testing.assert_array_equal(np.concatenate(got), np.concatenate(blocks))


class TestCaptureSource:
    """Capture thread -> native ring -> BlockStream feed (the full ISR-path
    replacement, SURVEY.md §2.1 #5)."""

    def _pcm_chunks(self, n_chunks, chunk_complex, seed=0):
        rng = np.random.default_rng(seed)
        chunks = [rng.integers(-2000, 2000, 2 * chunk_complex, dtype=np.int16)
                  for _ in range(n_chunks)]
        return chunks

    def test_blocks_match_direct_conversion(self):
        from radioframe.core.stream import CaptureSource
        from radioframe.native import iq_i16_to_c64

        chunks = self._pcm_chunks(8, 1024)
        src = CaptureSource(iter(chunks), block_len=512)
        got = np.concatenate([np.asarray(b)[0] for b in src])
        want = np.concatenate([iq_i16_to_c64(c) for c in chunks])
        np.testing.assert_array_equal(got, want[: len(got)])
        assert len(got) == 8 * 1024  # nothing lost, nothing invented
        assert src.overruns == 0

    def test_overrun_counted_when_consumer_stalls(self):
        import time

        from radioframe.core.stream import CaptureSource

        chunks = self._pcm_chunks(32, 1024)
        src = CaptureSource(iter(chunks), block_len=1024, capacity_blocks=2,
                            overrun_wait_s=0.001, overrun_retries=3)
        src.start()
        time.sleep(1.0)  # never consume: ring (2 blocks) must overrun
        assert src.overruns > 0
        # stream stays usable: drain what made it through
        got = sum(1 for _ in src)
        assert got >= 2

    def test_drives_rx_chain_identically(self):
        """BlockStream(CaptureSource) == feeding the same blocks directly."""
        import jax
        import jax.numpy as jnp

        from radioframe.core.config import RxConfig
        from radioframe.core.stream import BlockStream, CaptureSource
        from radioframe.native import iq_i16_to_c64
        from radioframe.ops import demod as demod_op
        from radioframe.ops import nco
        from radioframe.pipelines.rx_chain import RxChain

        chain = RxChain(RxConfig(channels=1, ols_hop=512))
        T = chain.min_block
        chunks = self._pcm_chunks(4, T, seed=3)
        words = jnp.asarray([nco.freq_word(10e3, 192e3)], jnp.int32)
        mode = jnp.asarray([demod_op.SSB], jnp.int32)

        from conftest import jrun, jwrap

        src = CaptureSource(iter(chunks), block_len=T)
        bs = BlockStream(chain.step, jax.jit(lambda: chain.init_state(1))(),
                         donate=False)
        outs, _ = bs.run(src, words, mode)
        got = np.concatenate([np.asarray(o) for o in outs], axis=-1)

        st = jrun(lambda: chain.init_state(1))
        step = jwrap(chain.step)
        ref = []
        for c in chunks:
            blk = iq_i16_to_c64(c)[None, :]
            st, a, _ = step(st, blk, words, mode)
            ref.append(np.asarray(a))
        ref = np.concatenate(ref, axis=-1)
        np.testing.assert_array_equal(got, ref)


def test_deinterleave_native():
    from radioframe.native import iq_i16_deinterleave

    pcm = np.arange(-8, 8, dtype=np.int16)  # [i0 q0 i1 q1 ...]
    xr, xi = iq_i16_deinterleave(pcm)
    np.testing.assert_array_equal(xr, pcm[0::2])
    np.testing.assert_array_equal(xi, pcm[1::2])


def test_capture_source_raw_i16(rng):
    """raw_i16 capture: ring carries interleaved int16; iterator yields
    (xr, xi) plane blocks; values match the complex64 route bit-for-bit."""
    from radioframe.core.stream import CaptureSource

    n_chunks, chunk = 6, 1024
    pcms = [(rng.standard_normal(2 * chunk) * 8192).astype(np.int16)
            for _ in range(n_chunks)]
    src = CaptureSource(iter(pcms), block_len=1536, raw_i16=True)
    blocks = list(src)
    assert len(blocks) == n_chunks * chunk // 1536
    got_r = np.concatenate([b[0][0] for b in blocks])
    got_i = np.concatenate([b[1][0] for b in blocks])
    allpcm = np.concatenate(pcms)
    np.testing.assert_array_equal(got_r, allpcm[0::2][: got_r.size])
    np.testing.assert_array_equal(got_i, allpcm[1::2][: got_i.size])
    assert src.overruns == 0
