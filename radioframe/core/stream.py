"""Block streaming — the TPU-era replacement for ISR-driven double buffering.

Reference analog (SURVEY.md §2.1 #5, §3.2): `[U:fpga.c]` EXTI ISR filling
ring-buffer halves that trigger the audio block loop. Here the "ISR" is an
async host->device prefetch one block ahead of the jitted step — the same
double-buffer discipline, expressed as dataflow:

    feed(block b+1) -> device   ||   step(state, block b) on device

Sources are plain iterables of numpy/jax blocks (fixtures, WAV readers, or
on-device synthetic generators for benchmarking, SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class BlockStream:
    """Runs a (state, block, *args) -> (state, out, aux) step over a source.

    Prefetches the next block to the device while the current one computes;
    with donated state the loop is a steady-state two-deep pipeline.
    """

    def __init__(self, step, state, device=None, donate: bool = True):
        self._step = jax.jit(step, donate_argnums=0) if donate else jax.jit(step)
        self.state = state
        self._device = device or jax.devices()[0]

    def _put(self, block):
        return jax.device_put(jnp.asarray(block), self._device)

    def run(self, source, *args, collect: bool = True):
        """Iterate ``source`` blocks through the step; returns (outs, auxs)."""
        outs, auxs = [], []
        it = iter(source)
        try:
            nxt = self._put(next(it))
        except StopIteration:
            return outs, auxs
        while nxt is not None:
            cur = nxt
            try:
                nxt = self._put(next(it))  # prefetch overlaps device compute
            except StopIteration:
                nxt = None
            self.state, out, aux = self._step(self.state, cur, *args)
            if collect:
                outs.append(out)
                auxs.append(aux)
        return outs, auxs


def wav_blocks(path: str, block_len: int):
    """Yield complex64 IQ blocks from a stereo WAV capture (zero-pad tail)."""
    from radioframe.io.wav import read_wav

    iq, _fs = read_wav(path)
    for i in range(0, len(iq), block_len):
        b = iq[i : i + block_len]
        if len(b) < block_len:
            b = np.pad(b, (0, block_len - len(b)))
        yield b[None, :]


def synthetic_blocks(generator, block_len: int, num_blocks: int, channels: int = 1, seed: int = 0):
    """Deterministic synthetic block source (benchmark ingest without host I/O)."""
    rng = np.random.default_rng(seed)
    for _ in range(num_blocks):
        yield generator(rng, channels, block_len)
