"""Locate the gap between the REAL flat int4 decode kernel (~190 GB/s) and
the minimal probe kernel (~390 GB/s on the same math, probe_flat_unpack B).

Structural differences of the real kernel: PrefetchScalarGridSpec + meta
scalar, bf16->f32 scale casts per call, row_head broadcast, kt/vt tail
blocks + tail fold, q (1, H, D) transpose, 28-layer lax.scan. Time the real
kernel in isolation at one layer, then ablations.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tools/probe_flat_real.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4

Hkv, G, D = 4, 7, 128
H = Hkv * G
R = 786432
TAIL = 320


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    rows_per_head = R // Hkv
    rh = jnp.asarray(np.repeat(np.arange(Hkv, dtype=np.int32),
                               rows_per_head))
    kq = jax.random.randint(key, (D // 2, R), 0, 255, jnp.uint8)
    vq = jax.random.randint(key, (D // 2, R), 0, 255, jnp.uint8)
    s_bf = jnp.full((R,), 0.01, jnp.bfloat16)
    z_bf = jnp.full((R,), -0.05, jnp.bfloat16)
    s_f32 = s_bf.astype(jnp.float32)
    z_f32 = z_bf.astype(jnp.float32)
    kt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    vt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    q = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    gb = R * (D + 8 + 4) / 1e9

    def bench(name, fn):
        @partial(jax.jit, static_argnames=("n",))
        def reps(q, n):
            o = q
            for _ in range(n):
                o = fn(o)
            return o

        def t(n):
            jax.device_get(reps(q, n))
            t0 = time.time()
            jax.device_get(reps(q, n))
            return time.time() - t0

        try:
            t1, t2 = t(4), t(16)
            slope = (t2 - t1) / 12
            log(f"{name:28s} slope {slope * 1e3:8.3f} ms "
                f"({gb / slope:5.0f} GB/s)")
        except Exception as e:
            log(f"{name:28s} FAILED {type(e).__name__}: {str(e)[:140]}")

    # 1. real kernel as the engine calls it (bf16 scales, tail, meta)
    bench("real (bf16 scales)", lambda o: flat_decode_attend_int4(
        o, kq, s_bf, z_bf, vq, s_bf, z_bf, rh, kt, vt, jnp.int32(3),
        scale=D ** -0.5))

    # 2. real kernel with pre-f32 scales (no per-call cast materialization)
    bench("real (f32 scales)", lambda o: flat_decode_attend_int4(
        o, kq, s_f32, z_f32, vq, s_f32, z_f32, rh, kt, vt, jnp.int32(3),
        scale=D ** -0.5))

    # 3. real kernel, block=16384
    bench("real blk=16384", lambda o: flat_decode_attend_int4(
        o, kq, s_f32, z_f32, vq, s_f32, z_f32, rh, kt, vt, jnp.int32(3),
        scale=D ** -0.5, block=16384))


if __name__ == "__main__":
    main()
