"""NCO / complex mixer — int32 DDS phase accumulator, batched over channels.

TPU-native reimagining of the reference's FPGA DDS (SURVEY.md §2.1 #1): the
phase accumulator is a wrapping int32 (Q0.32 turns), exactly like DDS
hardware, so phase continuity across blocks is bit-exact forever — no fp32
phase drift on infinite streams. Frequency resolution is fs/2^32 (≈45 µHz at
192 kHz). Per-channel frequency is a runtime input (SURVEY.md §3.4: retune =
update one element, no recompile).

Layout: x is (channels, time) complex64; freq words (channels,) int32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi
_SCALE = np.float32(2.0 ** -32)


def freq_word(freq_hz, fs) -> np.ndarray:
    """Host-side: frequency (Hz) -> int32 DDS increment (Q0.32 turns/sample)."""
    cycles = np.asarray(freq_hz, dtype=np.float64) / fs
    word = np.round((cycles - np.round(cycles)) * 2.0 ** 32)
    return word.astype(np.int64).astype(np.int32)  # wrap into int32


def word_to_freq(word, fs) -> np.ndarray:
    return np.asarray(word, dtype=np.float64) * fs / 2.0 ** 32


def init_state(num_channels: int):
    """Phase accumulator (turns, Q0.32), one per channel."""
    return jnp.zeros((num_channels,), dtype=jnp.int32)


def phase_ramp(word, phase_acc, T: int):
    """(C,) int32 word + (C,) int32 phase -> (C, T) float32 angle in radians."""
    n = jnp.arange(T, dtype=jnp.int32)
    # int32 multiply wraps mod 2^32 — exactly the DDS accumulator semantics
    acc = phase_acc[:, None] + word[:, None] * n[None, :]
    return acc.astype(jnp.float32) * (_SCALE * np.float32(TWO_PI)), acc


def mix_down(x, word, phase_acc):
    """y = x * e^{-j phase}; returns (y, new_phase_acc).

    ``word`` per channel; a signal at +f Hz (word=freq_word(f, fs)) lands at DC.
    """
    T = x.shape[-1]
    angle, _ = phase_ramp(word, phase_acc, T)
    osc = jnp.cos(angle) - 1j * jnp.sin(angle)
    new_acc = phase_acc + word * jnp.int32(T)  # wraps — exact continuity
    return x * osc.astype(x.dtype), new_acc


def mix_down_at(x, word, phase_acc, sample_offset):
    """mix_down evaluated at a (traced) int32 sample offset into the stream.

    Used by time-sharded chains: shard d computes its oscillator segment
    locally from the replicated phase state — no communication, exact
    (int32 wrap) agreement with the unsharded program. Does NOT advance the
    accumulator; the caller advances it once by the global block length.
    """
    T = x.shape[-1]
    base = phase_acc + word * sample_offset.astype(jnp.int32)
    angle, _ = phase_ramp(word, base, T)
    osc = jnp.cos(angle) - 1j * jnp.sin(angle)
    return x * osc.astype(x.dtype)


def mix_up_at(x, word, phase_acc, sample_offset):
    """mix_up at a sample offset (see mix_down_at)."""
    T = x.shape[-1]
    base = phase_acc + word * sample_offset.astype(jnp.int32)
    angle, _ = phase_ramp(word, base, T)
    osc = jnp.cos(angle) + 1j * jnp.sin(angle)
    return x * osc.astype(x.dtype)


def mix_up(x, word, phase_acc):
    """y = x * e^{+j phase} (DUC direction); returns (y, new_phase_acc)."""
    T = x.shape[-1]
    angle, _ = phase_ramp(word, phase_acc, T)
    osc = jnp.cos(angle) + 1j * jnp.sin(angle)
    new_acc = phase_acc + word * jnp.int32(T)
    return x * osc.astype(x.dtype), new_acc
