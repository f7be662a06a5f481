"""Stream-state checkpoint/resume on orbax (SURVEY.md §5 checkpoint row).

Reference analog: `[U:settings.c]` versioned EEPROM persistence + watchdog
recovery. Here the full DSP ``ChainState`` pytree (NCO phase accumulators,
FIR/CIC tails, AGC envelopes, demod states) snapshots at block-epoch
boundaries; restoring yields bit-exact stream continuation (tested in
tests/test_checkpoint.py). On multi-host failure the driver restarts from
the last epoch (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


class StreamCheckpointer:
    """Epoch-numbered state snapshots under a directory."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch:012d}")

    def save(self, epoch: int, state) -> str:
        path = self._path(epoch)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def epochs(self):
        pat = re.compile(r"^epoch_(\d{12})$")
        out = []
        for name in os.listdir(self.directory):
            m = pat.match(name)
            if m and os.path.isdir(os.path.join(self.directory, name)):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_epoch(self):
        eps = self.epochs()
        return eps[-1] if eps else None

    def restore(self, epoch: int, like):
        """Restore epoch's state with the dtypes/shapes/shardings of ``like``."""
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return self._ckptr.restore(self._path(epoch), abstract)
