"""Sweep block_q for the read-only scoring attention kernel.

Scoring re-streams each head's full live KV once per q-block; at the
2304-token scoring shape BQ=256 means 9 re-reads. Larger BQ cuts KV
traffic linearly if VMEM allows.

    timeout 1800 python tools/probe_scoring_bq.py
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
from kvzip_tpu.ops.flash_int4 import flash_attend_int4_extra


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, Hkv, Dh, H = (cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                     cfg.num_heads)
    C = 482816
    T = 2304
    F = 262144
    lens = jnp.full((Hkv,), F, jnp.int32)
    kq = jnp.full((Hkv, Dh // 2, C), 0x5A, jnp.uint8)
    ks = jnp.full((Hkv, C), 0.01, jnp.bfloat16)
    kz = jnp.full((Hkv, C), -0.02, jnp.bfloat16)
    vq = jnp.full((Hkv, Dh // 2, C), 0xA5, jnp.uint8)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((T, H, Dh)), jnp.bfloat16)
    kx = jnp.full((T, Hkv, Dh // 2), 0x33, jnp.uint8)
    kxs = jnp.full((T, Hkv, 1), 0.01, jnp.bfloat16)
    kxz = jnp.full((T, Hkv, 1), -0.02, jnp.bfloat16)

    flops = 4 * H * T * F * Dh * L

    for bq in (256, 576, 768, 1152):
        for bk in (512, 2048):
            f = jax.jit(lambda q, n=L, bq=bq, bk=bk: jax.lax.fori_loop(
                0, n, lambda i, acc: acc + flash_attend_int4_extra(
                    q, kq, ks, kz, vq, ks, kz, lens,
                    kx, kxs, kxz, kx, kxs, kxz,
                    scale=Dh ** -0.5, block_q=bq,
                    block_k=bk).astype(jnp.float32),
                jnp.zeros((T, H, Dh), jnp.float32)))
            try:
                np.asarray(jax.device_get(f(q)[0, 0, 0]))
                t0 = time.time()
                np.asarray(jax.device_get(f(q)[0, 0, 0]))
                dt = time.time() - t0
                log(f"BQ={bq:5d} BK={bk:5d}: {dt * 1e3:9.1f} ms per "
                    f"{L}-layer scoring pass ({flops / dt / 1e12:.0f} "
                    f"TFLOP/s)")
            except Exception as e:
                log(f"BQ={bq:5d} BK={bk:5d}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
