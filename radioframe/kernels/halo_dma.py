"""Pallas remote-DMA halo exchange (SURVEY.md §2.3 ring-halo row).

The default halo transport is `lax.ppermute` (radioframe/shard/halo.py),
which XLA lowers to ICI DMAs with its own scheduling. This kernel is the
explicit form — `pltpu.make_async_remote_copy` with send/recv semaphores —
which a fused front-end kernel can overlap with compute (start the RDMA,
filter the interior, wait, filter the boundary). Pattern per the public
Pallas distributed guide (SNIPPETS.md [2]).

Ring direction: every shard sends its LAST H samples to its RIGHT neighbor,
so shard d receives shard d-1's tail — exactly the causal-FIR halo. The
wrap-around value received by shard 0 is the block's global tail (the next
block's carry), same convention as halo.causal_halo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _halo_kernel(axis_name, H, interpret, x_ref, out_ref, send_sem, recv_sem):
    D = lax.axis_size(axis_name)
    my_id = lax.axis_index(axis_name)
    right = lax.rem(my_id + 1, D)
    T = x_ref.shape[-1]
    if interpret:
        # the interpret-mode discharge rule supports only single-axis
        # meshes and only scalar LOGICAL ids (upstream pallas limitation)
        dev_id, dev_type = right, pltpu.DeviceIdType.LOGICAL
    else:
        # MESH addressing with a partial dict: only the ring axis moves,
        # every other mesh axis keeps this shard's coordinate — the form
        # that works on multi-axis (channel x time) meshes over real ICI
        dev_id, dev_type = {axis_name: right}, pltpu.DeviceIdType.MESH
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(T - H, H)],
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=dev_id,
        device_id_type=dev_type,
    )
    rdma.start()
    rdma.wait()


def ring_halo_dma(x_local, H: int, axis_name: str = "time", interpret: bool = False):
    """Inside shard_map: returns the left neighbor's last H samples (C, H).

    (Shard 0 receives shard D-1's tail — the caller substitutes its carried
    block state there, as with the ppermute transport.) Complex streams ride
    as float32 pairs (complex64's memory layout) — the DMA engine and the
    interpreter both move raw f32 words.
    """
    C, T = x_local.shape
    is_complex = jnp.issubdtype(x_local.dtype, jnp.complexfloating)
    if is_complex:
        xf = jnp.stack([jnp.real(x_local), jnp.imag(x_local)], axis=-1).reshape(C, 2 * T)
        Hf = 2 * H
    else:
        xf, Hf = x_local, H
    kern = functools.partial(_halo_kernel, axis_name, Hf, interpret)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, Hf), xf.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True, collective_id=7),
        interpret=interpret,
    )(xf)
    if is_complex:
        pair = out.reshape(C, H, 2)
        out = lax.complex(pair[..., 0], pair[..., 1])
    return out


def causal_halo_dma(x_local, carry, H: int, axis: str = "time", interpret: bool = False,
                    ppermute_fallback: bool = False):
    """Drop-in for shard.halo.causal_halo using the Pallas RDMA transport.

    ``ppermute_fallback`` routes the transfer through lax.ppermute instead of
    the Pallas kernel while keeping this API — used when the caller runs on a
    multi-axis mesh in interpret mode (the interpret discharge rule upstream
    only handles single-axis meshes), so the surrounding overlap structure
    (zero-tail interior + boundary correction) is still exercised on CPU.
    """
    if H == 0:
        return x_local, carry
    D = lax.axis_size(axis)
    if D == 1:
        return jnp.concatenate([carry, x_local], axis=-1), x_local[..., -H:]
    if ppermute_fallback:
        recv = lax.ppermute(x_local[..., -H:], axis, [(i, (i + 1) % D) for i in range(D)])
    else:
        recv = ring_halo_dma(x_local, H, axis, interpret)
    d = lax.axis_index(axis)
    is0 = (d == 0)
    prepend = jnp.where(is0, carry, recv)
    new_carry = lax.psum(jnp.where(is0, recv, jnp.zeros_like(recv)), axis)
    return jnp.concatenate([prepend, x_local], axis=-1), new_carry
