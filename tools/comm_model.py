"""Cross-shard communication accounting for the pod channelizer forms.

One chip cannot measure cross-chip traffic, but the collectives a
formulation issues are static: this tool traces each sharded channelizer
step on a virtual D-device mesh and walks the jaxpr (recursively through
shard_map/pjit/scan bodies) summing the operand bytes of every
collective primitive. The result is the per-block, per-device
communication bill of BASELINE config 5's two pod formulations — the
quantity the ROADMAP's "removes the 67 MB/block all_to_all" claim rests
on, derived from the program instead of asserted.

Semantics of the reported numbers (per device, per block):
  ppermute   — operand bytes sent (and received) once: point-to-point.
  all_to_all — each device keeps 1/D of its operand and sends the rest:
               wire bytes = operand * (D-1)/D.
  all_gather — each device receives the operand from D-1 peers:
               wire bytes = operand * (D-1).
  psum       — reduction; costs ~2x an all-gather of the operand in a
               ring (counted as operand * 2 * (D-1)/D, the ring bound).

Run:  python tools/comm_model.py [--D 8] [--M 4096] [--blocks 1]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # pure analysis — never touch the TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# jax may already be imported with the platform baked in (sitecustomize);
# the config update still wins because backends initialize lazily
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

COLLECTIVES = ("ppermute", "all_to_all", "all_gather", "psum")


def _wire_factor(prim: str, D: int) -> float:
    """Operand-bytes -> wire-bytes factor per device (module docstring)."""
    return {"ppermute": 1.0,
            "all_to_all": (D - 1) / D,
            "all_gather": float(D - 1),
            "psum": 2.0 * (D - 1) / D}[prim]


def _walk(jaxpr, out, trip: int = 1):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVES:
            bytes_in = sum(int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                           for v in eqn.invars if hasattr(v, "aval"))
            out[name] = out.get(name, 0) + trip * bytes_in
        # a collective inside a loop body fires once per iteration: bill
        # scan bodies by their static length; while_loop trip counts are
        # unknowable statically, so refuse rather than under-count
        sub_trip = trip
        if name == "scan":
            sub_trip = trip * int(eqn.params.get("length", 1))
        elif name == "while":
            for sub in jax.core.jaxprs_in_params(eqn.params):
                probe = _walk(sub, {}, 1)
                if probe:
                    raise ValueError(
                        "collective inside lax.while_loop: trip count is "
                        f"not static, cannot bill {sorted(probe)} bytes")
        for sub in jax.core.jaxprs_in_params(eqn.params):
            _walk(sub, out, sub_trip)
    return out


def collective_bytes(fn, *args):
    """Trace fn(*args) and return {primitive: operand bytes} summed.

    CAVEAT: this bills the collectives present in the TRACED program
    (scan bodies multiplied by their static length). Communication the
    SPMD partitioner inserts later for ops OUTSIDE shard_map — e.g. the
    global fftshift jnp.roll applied to the channel-sharded waterfall in
    the two-kernel form — is not visible here; those are O(waterfall)
    bytes, second-order next to the full-rate terms above."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _walk(jaxpr.jaxpr, {})


def analyze(D: int, M: int, blocks_of_min: int = 1):
    from radioframe.pipelines.channelizer import (ChannelizerChain,
                                                  ChannelizerConfig)
    from radioframe.shard.channelizer import ShardedChannelizer

    mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
    base = dict(fs_in=61_440_000.0, num_channels=M, emit_spectrum=True,
                waterfall_from_pfb=True, waterfall_frame_avg=16,
                fuse_pfb=True, fuse_demod=True, dft_precision="b3")
    forms = [
        ("two-kernel (all_to_all)", dict(enabled_modes=(0, 1, 2, 3)), {}),
        ("single-pass xla (AM on)",
         dict(enabled_modes=(0, 1, 2, 3), fuse_single_pass=True),
         dict(force_general=True)),
        ("single-pass emit_env (no AM)",
         dict(enabled_modes=(0, 1, 3), fuse_single_pass=True),
         dict(force_general=True)),
    ]
    rows = []
    for name, kw, skw in forms:
        chain = ChannelizerChain(ChannelizerConfig(**base, **kw))
        sch = ShardedChannelizer(chain, mesh, **skw)
        T = blocks_of_min * D * chain.min_block
        en = kw["enabled_modes"]
        mode = jnp.asarray(np.array(en)[np.arange(M) % len(en)], jnp.int32)
        state = jax.eval_shape(chain.init_state)
        wide = jax.ShapeDtypeStruct((T,), jnp.complex64)
        per_prim = collective_bytes(sch.step, state, wide, mode)
        wire = sum(b * _wire_factor(p, D) for p, b in per_prim.items())
        rows.append((name, T, per_prim, wire))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--D", type=int, default=8)
    ap.add_argument("--M", type=int, default=4096)
    ap.add_argument("--blocks", type=int, default=1,
                    help="block length in units of D*min_block")
    args = ap.parse_args()
    rows = analyze(args.D, args.M, args.blocks)
    print(f"config-5 cross-shard bytes per block, per device "
          f"(D={args.D}, M={args.M}):")
    for name, T, per_prim, wire in rows:
        in_bytes = T * 8  # complex64 wideband block (whole)
        print(f"\n  {name}  (block T={T}, wideband {in_bytes / 1e6:.1f} MB)")
        for p in COLLECTIVES:
            if p in per_prim:
                b = per_prim[p]
                print(f"    {p:<11} operand {b / 1e6:9.3f} MB   wire "
                      f"{b * _wire_factor(p, args.D) / 1e6:9.3f} MB")
        print(f"    TOTAL wire  {wire / 1e6:9.3f} MB  "
              f"({100.0 * wire / in_bytes:.1f}% of the wideband block)")


if __name__ == "__main__":
    main()
