"""2-process DCN-analog probe (VERDICT r4 ask #6; SURVEY.md §2.4 DCN row).

The environment has ONE TPU chip, so the 2-host scaling run
(BASELINE "≥90% scaling 1 chip -> 2 hosts") cannot execute on real DCN.
This probe exercises the same CODEPATH across a real PROCESS boundary
instead: two local CPU processes x 4 faked devices each, joined with
``jax.distributed.initialize`` (the framework's only process-level setup —
no NCCL/MPI, XLA/Gloo collectives underneath, shard/mesh.py module doc),
then

  1. ``make_hybrid_mesh`` over the 2x4 process topology — a psum over the
     cross-process 'channel' axis proves the DCN-analog axis carries
     collectives;
  2. the SHARDED CHANNELIZER, one streaming step on an 8-device 1-D mesh
     whose time axis SPANS the process boundary (causal halo ppermute +
     all_to_all + prefix completions all cross processes), checked
     numerically against the unsharded chain run by process 0.

Run:  python tools/probe_dcn.py            (driver: spawns the 2 workers)
      python tools/probe_dcn.py --worker N (one worker; used internally)

Multi-controller JAX: both workers run the SAME program; global arrays are
assembled with jax.make_array_from_callback and results fetched as
replicated scalars / process_allgather.
"""

from __future__ import annotations

import os
import subprocess
import sys

PORT = 52345
M = 32  # dense (non-Pallas) channelizer path: the probe targets the
# cross-process collectives, not the kernels (which are interpret-mode on
# CPU anyway and covered by the single-process suite)


def worker(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    # --- 1. hybrid mesh: 'channel' axis spans the process boundary --------
    from radioframe.shard.mesh import make_hybrid_mesh

    hybrid = make_hybrid_mesh(channel_per_host=2, time=2,
                              init_distributed=False)
    assert dict(hybrid.shape) == {"channel": 4, "time": 2}

    @jax.jit
    def cross_host_psum(x):
        return jax.shard_map(
            lambda v: jax.lax.psum(v, "channel"), mesh=hybrid,
            in_specs=P("channel"), out_specs=P(None))(x)

    xs = jax.make_array_from_callback(
        (4,), NamedSharding(hybrid, P("channel")),
        lambda idx: np.arange(4, dtype=np.float32)[idx])
    total = float(cross_host_psum(xs)[0])
    assert total == 6.0, total  # 0+1+2+3 summed ACROSS the process boundary

    # --- 2. sharded channelizer across the process boundary ---------------
    from radioframe.pipelines.channelizer import (ChannelizerChain,
                                                  ChannelizerConfig)
    from radioframe.shard.channelizer import ShardedChannelizer

    cfg = ChannelizerConfig(fs_in=15_000.0 * M, num_channels=M,
                            emit_spectrum=True, waterfall_from_pfb=True,
                            waterfall_frame_avg=4)
    chain = ChannelizerChain(cfg)
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("dev",))
    sch = ShardedChannelizer(chain, mesh)

    D = 8
    T = D * 2 * chain.min_block
    rng = np.random.default_rng(11)
    wide_np = (rng.standard_normal(T)
               + 1j * rng.standard_normal(T)).astype(np.complex64)
    mode_np = (np.arange(M) % 4).astype(np.int32)

    wide = jax.make_array_from_callback(
        (T,), NamedSharding(mesh, P("dev")), lambda idx: wide_np[idx])
    mode = jax.make_array_from_callback(
        (M,), NamedSharding(mesh, P()), lambda idx: mode_np[idx])
    specs = sch.state_specs()
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    state = jax.jit(chain.init_state, out_shardings=shardings)()
    step = jax.jit(sch.step)
    state, audio, aux = step(state, wide, mode)
    state, audio, aux = step(state, wide, mode)  # carry handoff crosses too

    from jax.experimental import multihost_utils

    audio_g = np.asarray(multihost_utils.process_allgather(
        audio, tiled=True)).reshape(M, -1)[:, -T // M:]

    # reference: the UNSHARDED chain on process 0's local CPU
    if pid == 0:
        st = chain.init_state()
        ustep = jax.jit(chain.step)
        st, a1, _ = ustep(st, jnp.asarray(wide_np), jnp.asarray(mode_np))
        st, a2, _ = ustep(st, jnp.asarray(wide_np), jnp.asarray(mode_np))
        np.testing.assert_allclose(audio_g, np.asarray(a2), atol=2e-4)
        print(f"probe_dcn OK: 2 processes x 4 devices, hybrid psum across "
              f"DCN-analog axis, sharded channelizer step (halo ppermute + "
              f"all_to_all + prefix completion across the process "
              f"boundary) == unsharded, M={M} T={T}", flush=True)
    multihost_utils.sync_global_devices("probe_dcn_done")


def driver() -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    procs = [subprocess.Popen([sys.executable, __file__, "--worker", str(i)],
                              env=env) for i in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], f"worker exit codes {rcs}"
    print("probe_dcn driver OK")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        driver()
