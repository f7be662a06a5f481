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
