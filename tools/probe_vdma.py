"""Minimal probes: which manual-DMA + unpack patterns does Mosaic accept
for the int4 V side?

  v64a — DMA (BK, 64) uint8, int32 cast only (no unpack)
  v64b — + nibble unpack via LANE concat -> (BK, 128)
  v64c — + NN matmul p @ vn            (the real kernel pattern)
  vTa  — V transposed (64, BK) DMA + SUBLANE concat -> (128, BK) f32
  vTb  — vTa + f32 NT matmul p @ vnT ((1,),(1,))

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_vdma.py
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

C, BK = 8192, 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(name, shape, kernel_body):
    v = jax.random.randint(jax.random.PRNGKey(0), shape, 0, 255, jnp.uint8)
    buf_shape = (shape[0], BK) if shape[0] == 64 else (BK, shape[1])

    def kernel(v_hbm, o_ref, v_buf, sem):
        if shape[0] == 64:
            cp = pltpu.make_async_copy(v_hbm.at[:, pl.ds(0, BK)], v_buf, sem)
        else:
            cp = pltpu.make_async_copy(v_hbm.at[pl.ds(0, BK), :], v_buf, sem)
        cp.start()
        cp.wait()
        o_ref[...] = kernel_body(v_buf)

    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM(buf_shape, jnp.uint8),
                            pltpu.SemaphoreType.DMA],
        )(v)
        jax.device_get(out)
        log(f"{name:6s} OK")
    except Exception as e:
        log(f"{name:6s} FAILED: {str(e)[:160]}")


def v64a(buf):
    vpi = buf[...].astype(jnp.int32)
    return (vpi[:8, :] * 1).astype(jnp.float32) @ jnp.ones((64, 128),
                                                           jnp.float32)


def v64b(buf):
    vpi = buf[...].astype(jnp.int32)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=1).astype(jnp.float32)
    return vn[:8, :]


def v64c(buf):
    vpi = buf[...].astype(jnp.int32)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=1).astype(jnp.bfloat16)
    p = jnp.ones((8, BK), jnp.bfloat16)
    return jax.lax.dot_general(p, vn, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def vTa(buf):
    vpi = buf[...].astype(jnp.int32)   # (64, BK)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=0).astype(jnp.float32)
    return vn[:8, :128]


def vTb(buf):
    vpi = buf[...].astype(jnp.int32)
    vn = jnp.concatenate([vpi >> 4, vpi & 0xF], axis=0).astype(jnp.float32)
    p = jnp.ones((8, BK), jnp.float32)
    return jax.lax.dot_general(p, vn, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


run("v64a", (C, 64), v64a)
run("v64b", (C, 64), v64b)
run("v64c", (C, 64), v64c)
run("vTa", (64, C), vTa)
run("vTb", (64, C), vTb)
