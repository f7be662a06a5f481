"""Pallas remote-DMA halo == ppermute halo (interpret mode on the CPU mesh;
the same kernel compiles for real ICI on TPU pods)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from radioframe.kernels.halo_dma import causal_halo_dma
from radioframe.shard.halo import causal_halo

# kernel tests: interpret on the CPU mesh, COMPILED for real under
# RADIOFRAME_TEST_TPU=1 (SURVEY 4.2 #5: same tests run unmodified on TPU)
_INTERP = jax.default_backend() == "cpu"


def _shard(f, mesh):
    return jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, None), P(None, "time")),
        out_specs=(P(None, "time"), P(None, None)),
        check_vma=False))


@pytest.mark.parametrize("D,H,dtype", [(4, 4, np.complex64), (8, 7, np.complex64),
                                       (4, 3, np.float32)])
def test_rdma_matches_ppermute(rng, D, H, dtype):
    mesh = jax.make_mesh((D,), ("time",), devices=jax.devices()[:D])
    T = 16 * D
    if dtype == np.complex64:
        x = (rng.standard_normal((2, T)) + 1j * rng.standard_normal((2, T))).astype(dtype)
        carry = (rng.standard_normal((2, H)) + 1j * rng.standard_normal((2, H))).astype(dtype)
    else:
        x = rng.standard_normal((2, T)).astype(dtype)
        carry = rng.standard_normal((2, H)).astype(dtype)

    f_dma = _shard(lambda c, x: causal_halo_dma(x, c, H, "time", interpret=_INTERP), mesh)
    f_pp = _shard(lambda c, x: causal_halo(x, c, H, "time"), mesh)
    xp1, c1 = f_dma(jnp.asarray(carry), jnp.asarray(x))
    xp2, c2 = f_pp(jnp.asarray(carry), jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(xp1), np.asarray(xp2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
