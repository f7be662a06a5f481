"""Panorama FFT / waterfall (SURVEY.md §2.1 #11, reference `[U:fft.c]`).

Batched windowed FFT -> shifted magnitude (dB) -> EMA averaging across
frames; waterfall is just the stacked frame output (BASELINE.json config 5).
State = previous EMA line per channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from radioframe.ops.scans import affine_scan


class Spectrum:
    def __init__(self, nfft: int = 1024, avg: float = 0.0, window: str = "hann"):
        self.nfft = int(nfft)
        self.avg = float(avg)
        w = np.hanning(self.nfft) if window == "hann" else np.ones(self.nfft)
        self._w = (w / np.sqrt(np.mean(w**2))).astype(np.float32)

    def init_state(self, num_channels: int):
        return jnp.full((num_channels, self.nfft), -120.0, dtype=jnp.float32)

    def __call__(self, prev, x):
        """(prev (C, nfft), x (C, T)) -> (lines (C, F, nfft) dB, new_prev)."""
        C, T = x.shape
        F = T // self.nfft
        xs = x[:, : F * self.nfft].reshape(C, F, self.nfft) * jnp.asarray(self._w)
        mag2 = jnp.abs(jnp.fft.fftshift(jnp.fft.fft(xs, axis=-1), axes=-1)) ** 2
        db = 10.0 * jnp.log10(jnp.maximum(mag2, 1e-24)).astype(jnp.float32)
        if self.avg > 0.0:
            # EMA across frames: line[f] = a*line[f-1] + (1-a)*db[f] — an
            # affine scan along the frame axis (move frames to last axis)
            a = jnp.full((C, self.nfft, F), jnp.float32(self.avg))
            b = (1.0 - self.avg) * jnp.moveaxis(db, 1, -1)
            lines = affine_scan(a, b, prev)  # prev as s0 per (C, nfft)
            lines = jnp.moveaxis(lines, -1, 1)
            new_prev = lines[:, -1, :] if F else prev
            return lines, new_prev
        return db, (db[:, -1, :] if F else prev)


class ZoomSpectrum:
    """Zoomed panorama: Z-x frequency resolution around a tunable center.

    Reference analog: the LCD panorama zoom (x2..x16) in `[U:fft.c]` —
    implemented there by decimating the FFT input. Same design here:
    mix the IQ tap down by ``center_word`` (int32 DDS, runtime input — no
    recompile on pan), decimate by Z with a boxcar^2 anti-alias FIR, then
    the ordinary nfft panorama over the Z-x-narrower span. Resolution is
    fs/(Z*nfft) per bin over a span of fs/Z centered at the zoom center.

    State = {"nco" (C,) int32 DDS accumulator, "fir" decimator tail,
    "spec" EMA line} — explicit, streaming like everything else.
    """

    def __init__(self, nfft: int = 1024, zoom: int = 4, avg: float = 0.0):
        from radioframe.ops.fir import cic_decimator

        assert zoom >= 1
        self.zoom = int(zoom)
        self.nfft = int(nfft)
        self.spec = Spectrum(nfft, avg)
        self.decim = cic_decimator(self.zoom, N=2) if self.zoom > 1 else None

    def init_state(self, num_channels: int):
        from radioframe.ops import nco

        return {
            "nco": nco.init_state(num_channels),
            "fir": (self.decim.init_state(num_channels)
                    if self.decim is not None else ()),
            "spec": self.spec.init_state(num_channels),
        }

    def __call__(self, state, x, center_word):
        """(state, x (C, T), center_word (C,) i32) -> (lines (C,F,nfft), state').

        T must be a multiple of zoom*nfft."""
        from radioframe.ops import nco

        y, acc = nco.mix_down(x, center_word, state["nco"])
        fir_tail = state["fir"]
        if self.decim is not None:
            y, fir_tail = self.decim(state["fir"], y)
        lines, spec_prev = self.spec(state["spec"], y)
        return lines, {"nco": acc, "fir": fir_tail, "spec": spec_prev}


def snap_to_peak(spectrum_db, fs: float, search_hz: float, nfft: int):
    """Auto frequency snap (reference `[U:snap.c]`, SURVEY.md §2.2 #25):
    argmax of the averaged spectrum within ±search_hz of center -> Hz offset."""
    C, N = spectrum_db.shape
    freqs = (jnp.arange(N) - N // 2) * (fs / N)
    mask = jnp.abs(freqs) <= search_hz
    masked = jnp.where(mask[None, :], spectrum_db, -jnp.inf)
    idx = jnp.argmax(masked, axis=-1)
    return freqs[idx]
