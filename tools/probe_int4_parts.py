"""Isolate which DMA/compute pattern breaks the int4 flash v2 compile.

Variants (each a cut-down kernel, compiled at tiny shapes):
  k     — only the transposed-K uint8 (D//2, BK) manual DMA + NN matmul
  ksz   — k + the (2, BK) f32 scale DMA
  v     — only the row-major V uint8 (BK, D//2) manual DMA + PV matmul
  all   — the real kernel

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int4_parts.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

Hkv, D, C, BK = 4, 128, 8192, 512
G, BQ = 7, 128
rows = G * BQ


def log(m):
    print(m, file=sys.stderr, flush=True)


def try_variant(name, kernel, operands, scratch):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Hkv, 1),
        in_specs=[pl.BlockSpec((1, rows, D), lambda h, qb, m: (h, 0, 0))] + [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            for _ in operands[1:]],
        out_specs=pl.BlockSpec((1, rows, D), lambda h, qb, m: (h, 0, 0)),
        scratch_shapes=scratch,
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Hkv, rows, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(jnp.zeros((1,), jnp.int32), *operands)
        jax.device_get(out)
        log(f"{name:6s} OK")
    except Exception as e:
        log(f"{name:6s} FAILED: {str(e)[:200]}")


key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (Hkv, rows, D), jnp.bfloat16)
kq = jax.random.randint(key, (Hkv, D // 2, C), 0, 255, jnp.uint8)
vq = jax.random.randint(key, (Hkv, C, D // 2), 0, 255, jnp.uint8)
ksz = jnp.ones((Hkv, 2, C), jnp.float32)


def k_kernel(meta_ref, q_ref, kq_hbm, o_ref, kq_buf, sem):
    h = pl.program_id(0)
    cp = pltpu.make_async_copy(
        kq_hbm.at[h, :, pl.ds(0, BK)], kq_buf, sem)
    cp.start()
    cp.wait()
    qv = q_ref[0]
    kpi = kq_buf[...].astype(jnp.int32)
    kn = jnp.concatenate([kpi >> 4, kpi & 0xF], axis=0).astype(qv.dtype)
    s = jax.lax.dot_general(qv, kn, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (s[:, :D]).astype(jnp.bfloat16)


try_variant("k", k_kernel, (q, kq),
            [pltpu.VMEM((D // 2, BK), jnp.uint8), pltpu.SemaphoreType.DMA])


def ksz_kernel(meta_ref, q_ref, kq_hbm, ksz_hbm, o_ref, kq_buf, ksz_buf, sem):
    h = pl.program_id(0)
    cp = pltpu.make_async_copy(
        kq_hbm.at[h, :, pl.ds(0, BK)], kq_buf, sem.at[0])
    cp2 = pltpu.make_async_copy(
        ksz_hbm.at[h, :, pl.ds(0, BK)], ksz_buf, sem.at[1])
    cp.start(); cp2.start(); cp.wait(); cp2.wait()
    qv = q_ref[0]
    kpi = kq_buf[...].astype(jnp.int32)
    kn = jnp.concatenate([kpi >> 4, kpi & 0xF], axis=0).astype(qv.dtype)
    s = jax.lax.dot_general(qv, kn, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * ksz_buf[0:1] + ksz_buf[1:2]
    o_ref[0] = (s[:, :D]).astype(jnp.bfloat16)


try_variant("ksz", ksz_kernel, (q, kq, ksz),
            [pltpu.VMEM((D // 2, BK), jnp.uint8),
             pltpu.VMEM((2, BK), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))])


def v_kernel(meta_ref, q_ref, vq_hbm, o_ref, vq_buf, sem):
    h = pl.program_id(0)
    cp = pltpu.make_async_copy(
        vq_hbm.at[h, pl.ds(0, BK), :], vq_buf, sem)
    cp.start()
    cp.wait()
    qv = q_ref[0]
    p = jnp.broadcast_to(qv[:, :1], (qv.shape[0], BK))
    vpi = vq_buf[...].astype(jnp.int32)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=1).astype(qv.dtype)
    acc = jax.lax.dot_general(p.astype(qv.dtype), vn, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(jnp.bfloat16)


try_variant("v", v_kernel, (q, vq),
            [pltpu.VMEM((BK, D // 2), jnp.uint8), pltpu.SemaphoreType.DMA])
