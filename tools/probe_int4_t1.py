"""Chip-validate flash_attend_int4 at decode/query shapes (T=1/4/16).

The zero-copy head-level eviction decodes against the DENSE int4 cache, so
the kernel must compile and run at tiny T (it was prefill-only, T>8, until
round 3). Prints per-T latency for a 28-layer loop at a head-level-like
fill.

    timeout 1200 python tools/probe_int4_t1.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.config import resolve_config
from kvzip_tpu.ops.flash_int4 import flash_attend_int4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, Hkv, Dh, H = (cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                     cfg.num_heads)
    C = 482816
    # head-level fill: some heads full, some sink-only
    lens = jnp.asarray([480160, 160, 480160, 480160], jnp.int32)[:Hkv]
    kq = jnp.full((Hkv, Dh // 2, C), 0x5A, jnp.uint8)
    ks = jnp.full((Hkv, C), 0.01, jnp.bfloat16)
    kz = jnp.full((Hkv, C), -0.02, jnp.bfloat16)
    vq = jnp.full((Hkv, Dh // 2, C), 0xA5, jnp.uint8)
    live_gb = (2 * (Dh // 2) + 4 * ks.dtype.itemsize) * int(
        jax.device_get(lens.sum())) * L / 1e9

    rng = np.random.default_rng(0)
    for T in (1, 4, 16):
        q = jnp.asarray(rng.standard_normal((T, H, Dh)), jnp.bfloat16)
        pos0 = jnp.asarray(480160, jnp.int32)

        for bk in (512, 2048, 4096, 8192):
            f = jax.jit(lambda q, n=L, bk=bk: jax.lax.fori_loop(
                0, n, lambda i, acc: acc + flash_attend_int4(
                    q, kq, ks, kz, vq, ks, kz, lens, pos0,
                    scale=Dh ** -0.5, block_k=bk).astype(jnp.float32),
                jnp.zeros((T, H, Dh), jnp.float32)))
            try:
                np.asarray(jax.device_get(f(q)[0, 0, 0]))
                t0 = time.time()
                np.asarray(jax.device_get(f(q)[0, 0, 0]))
                dt = time.time() - t0
                log(f"T={T:3d} BK={bk:5d}: {dt * 1e3:8.2f} ms per {L}-layer "
                    f"pass ({live_gb / dt:.0f} GB/s live-KV read)")
            except Exception as e:
                log(f"T={T:3d} BK={bk:5d}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
