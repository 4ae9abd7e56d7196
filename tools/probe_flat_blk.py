"""Measure the flat int4 decode kernel slope vs key-block size.

The 131k post-eviction decode step spends ~4 ms in flat attention vs a
~0.8 ms bandwidth roofline. Suspect: grid-step overhead (20 blocks x 28
layers = 560 steps at 2-4 us each) + VPU chains over mostly-padded tiles.
Slope method per axon-tpu-quirks: chain n reps inside one jit, report
(t_n2 - t_n1) / (n2 - n1).

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python tools/probe_flat_blk.py
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

from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4

L, Hkv, G, D = 28, 4, 7, 128
H = Hkv * G
TAIL_CAP = 320


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(R_PAD, key):
    rows_per_head = R_PAD // Hkv
    row_head = np.broadcast_to(
        np.repeat(np.arange(Hkv, dtype=np.int32), rows_per_head), (L, R_PAD))
    return dict(
        kq=jax.random.randint(key, (L, D // 2, R_PAD), 0, 255, jnp.uint8),
        vq=jax.random.randint(key, (L, D // 2, R_PAD), 0, 255, jnp.uint8),
        ks=jnp.full((L, R_PAD), 0.01, jnp.float32),
        kz=jnp.full((L, R_PAD), -0.05, jnp.float32),
        vs=jnp.full((L, R_PAD), 0.01, jnp.float32),
        vz=jnp.full((L, R_PAD), -0.05, jnp.float32),
        rh=jnp.asarray(row_head),
        kt=jnp.zeros((L, Hkv, TAIL_CAP, D), jnp.bfloat16),
        vt=jnp.zeros((L, Hkv, TAIL_CAP, D), jnp.bfloat16),
    )


def run_variant(c, blk, n1, n2, R_PAD):
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def reps(q, c, n):
        def body(q, li):
            o = flat_decode_attend_int4(
                q, c["kq"], c["ks"], c["kz"], c["vq"], c["vs"], c["vz"],
                c["rh"], c["kt"][0], c["vt"][0], jnp.int32(3),
                scale=D ** -0.5, block=blk, layer=li)
            return o, None
        for _ in range(n):
            q, _ = jax.lax.scan(body, q, jnp.arange(L, dtype=jnp.int32))
        return q

    key = jax.random.PRNGKey(1)
    q0 = jax.random.normal(key, (1, H, D), jnp.bfloat16)

    def t(n):
        jax.device_get(reps(q0, c, n))  # warm/compile
        t0 = time.time()
        jax.device_get(reps(q0, c, n))
        return time.time() - t0

    t1, t2 = t(n1), t(n2)
    slope = (t2 - t1) / (n2 - n1)
    gb = (R_PAD * (D + 8 + 4) * L) / 1e9  # nibbles + scales(bf16 x4) + rh
    log(f"R={R_PAD} blk={blk:6d}: slope {slope * 1e3:7.3f} ms/step "
        f"({gb / slope:.0f} GB/s)  [t{n1}={t1 * 1e3:.0f} t{n2}={t2 * 1e3:.0f}]")
    return slope


def main():
    key = jax.random.PRNGKey(0)
    for R_PAD in (163840, 524288):
        c = build(R_PAD, key)
        for blk in (8192, 16384, 32768, 65536):
            if R_PAD % blk:
                continue
            try:
                run_variant(c, blk, 4, 12, R_PAD)
            except Exception as e:
                log(f"R={R_PAD} blk={blk}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")
        del c


if __name__ == "__main__":
    main()
