"""Stream-state checkpoint/resume on orbax (SURVEY.md §5 checkpoint row).

Reference analog: `[U:settings.c]` versioned EEPROM persistence + watchdog
recovery. Here the full DSP ``ChainState`` pytree (NCO phase accumulators,
FIR/CIC tails, AGC envelopes, demod states) snapshots at block-epoch
boundaries; restoring yields bit-exact stream continuation (tested in
tests/test_api_aux.py and tests/test_fault.py). On multi-host failure the driver restarts from
the last epoch (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

# State-schema version, bumped when the ChainState pytree layout changes —
# the TPU-era analog of the reference's versioned settings struct whose
# loader migrates older EEPROM layouts (`[U:settings.c]`). v1 = round-1
# layout (scalar AGC envelope, no deemph/eq keys); v2 = round-2 (AgcBank
# {hist, env, lpf} dict, deemph/eq feature keys).
CURRENT_VERSION = 2


def _migrate_v1_to_v2(state):
    """Round-1 -> round-2 layout for default-config chains.

    - RX 'agc' scalar envelope -> AgcBank {hist: (), env, lpf: 0} (lpf is
      inert at the v1-default instant attack, so zeros resume bit-exactly)
    - RX gains 'deemph': (), TX gains 'eq': () (features default-disabled).
    """
    def walk(d):
        if not isinstance(d, dict):
            return d
        d = {k: walk(v) for k, v in d.items()}
        if "agc" in d and not isinstance(d["agc"], dict):
            env = np.asarray(d["agc"])
            d["agc"] = {"hist": (), "env": env, "lpf": np.zeros_like(env)}
            d.setdefault("deemph", ())
        if "comp" in d and "ssb" in d:  # a TxChain state
            d.setdefault("eq", ())
        return d

    return walk(state)


MIGRATIONS = {1: _migrate_v1_to_v2}

# Plane-safe host/device crossings (r5): the axon TPU transport has no
# complex64 host<->device path, so checkpoint save fetches complex leaves
# as f32 planes through one jitted program (combined to numpy complex on
# the host — the on-disk format is unchanged) and restore re-places them
# through jitted lax.complex. Non-complex leaves use the normal path.
_REIM = None
_CPLX = None


def _fetch_host(state):
    global _REIM
    import jax.numpy as jnp

    if _REIM is None:
        _REIM = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))

    def one(x):
        if isinstance(x, jax.Array) and np.issubdtype(x.dtype, np.complexfloating):
            re, im = _REIM(x)
            return (np.asarray(re) + 1j * np.asarray(im)).astype(x.dtype)
        return np.asarray(x) if isinstance(x, jax.Array) else x

    return jax.tree.map(one, state)


def _place_device(state):
    global _CPLX

    if _CPLX is None:
        _CPLX = jax.jit(jax.lax.complex)

    def one(x):
        if np.issubdtype(np.asarray(x).dtype, np.complexfloating) \
                and not isinstance(x, jax.Array):
            xn = np.asarray(x)
            f = np.float32 if xn.dtype == np.complex64 else np.float64
            return _CPLX(np.ascontiguousarray(xn.real, f),
                         np.ascontiguousarray(xn.imag, f))
        return x

    return jax.tree.map(one, state)


class StreamCheckpointer:
    """Epoch-numbered state snapshots under a directory, schema-versioned."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch:012d}")

    def save(self, epoch: int, state, version: int = CURRENT_VERSION) -> str:
        path = self._path(epoch)
        payload = {"version": np.int32(version), "state": _fetch_host(state)}
        self._ckptr.save(path, payload, force=True)
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

    def restore(self, epoch: int, like, migrations=None):
        """Restore epoch's state with the dtypes/shapes/shardings of ``like``.

        Older-schema checkpoints (including unversioned round-1 snapshots)
        are migrated forward through ``MIGRATIONS`` before matching against
        ``like`` — settings.c-style version migration.
        """
        path = self._path(epoch)
        # bare shape/dtype structs (no sharding): restore lands on the HOST
        # and complex leaves re-enter the device via _place_device — orbax
        # must not device_put complex itself (no such transfer on axon)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like)
        vers_abs = jax.ShapeDtypeStruct((), np.int32)
        try:
            payload = self._ckptr.restore(path, {"version": vers_abs, "state": abstract})
            # complex leaves re-enter the device through jitted lax.complex
            # (plane-safe on transports without complex transfers, r5)
            return _place_device(payload["state"])
        except (ValueError, KeyError, TypeError):
            pass  # layout mismatch: older schema — raw-restore and migrate
        raw = self._ckptr.restore(path)
        if isinstance(raw, dict) and set(raw) == {"version", "state"}:
            v, st = int(raw["version"]), raw["state"]
        else:
            v, st = 1, raw  # unversioned round-1 checkpoint
        migrations = MIGRATIONS if migrations is None else migrations
        while v < CURRENT_VERSION:
            if v not in migrations:
                raise ValueError(f"no migration from state-schema v{v}")
            st = migrations[v](st)
            v += 1
        # a template-free orbax restore returns lists for tuples — rebuild
        # with `like`'s structure (tuple-vs-list is not a schema difference)
        st = jax.tree.unflatten(jax.tree.structure(like), jax.tree.leaves(st))
        return _place_device(jax.tree.map(
            lambda ref, x: np.asarray(x, dtype=ref.dtype), like, st))
