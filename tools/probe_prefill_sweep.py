"""Block-size sweep for the int4 flash prefill kernel (v2).

One chip session, several (BQ, BK) configs, each timed with the chain
method (t3-t1)/2 at the 7B/131k last-chunk geometry (T=16384 queries vs
base=114688 live rows) — the most expensive prefill call. Prints TFLOP/s
per config so the kernel default can be picked from data.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
         python tools/probe_prefill_sweep.py [T] [BASE]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.ops.flash_int4 import flash_attend_int4  # noqa: E402

L, H, Hkv, D = 28, 28, 4, 128
C = 147456  # 131072 + slack, multiple of 512
T = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
BASE = int(sys.argv[2]) if len(sys.argv) > 2 else 114688

CONFIGS = [(256, 512), (512, 512), (512, 256), (256, 1024), (512, 1024),
           (1024, 512), (128, 512)]


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    kq = jax.random.randint(key, (L, Hkv, D // 2, C), 0, 255, jnp.uint8)
    vq = jax.random.randint(key, (L, Hkv, D // 2, C), 0, 255, jnp.uint8)
    ks = jnp.full((L, Hkv, C), 0.01, jnp.bfloat16)
    kz = jnp.full((L, Hkv, C), -0.05, jnp.bfloat16)
    q0 = jax.random.normal(key, (T, H, D), jnp.bfloat16)
    lens = jnp.full((Hkv,), BASE, jnp.int32)
    pos0 = jnp.asarray(BASE, jnp.int32)
    scale = D ** -0.5
    flops = (BASE * T + T * T / 2) * H * D * 4 * L

    for bq, bk in CONFIGS:
        @jax.jit
        def run(q, kq, ks, kz, vq, vs, vz, dummy, bq=bq, bk=bk):
            def rep(q, _):
                def body(qc, xs):
                    kq_, ks_, kz_, vq_, vs_, vz_ = xs
                    o = flash_attend_int4(qc, kq_, ks_, kz_, vq_, vs_, vz_,
                                          lens, pos0, scale=scale,
                                          block_q=bq, block_k=bk)
                    return o.astype(qc.dtype), None
                q, _ = jax.lax.scan(body, q, (kq, ks, kz, vq, vs, vz))
                return q, None
            q, _ = jax.lax.scan(rep, q, dummy)
            return q

        def timed(reps):
            t0 = time.time()
            jax.device_get(run(q0, kq, ks, kz, vq, ks, kz,
                               jnp.zeros((reps,)))[0, 0])
            return time.time() - t0

        try:
            timed(1)
            t1 = timed(1)
            timed(3)
            t3 = timed(3)
            per = (t3 - t1) / 2
            log(f"BQ={bq} BK={bk}: {per * 1e3:.0f} ms per 28-layer pass "
                f"({flops / per / 1e12:.1f} TFLOP/s, t1={t1 * 1e3:.0f} "
                f"t3={t3 * 1e3:.0f})")
        except Exception as e:
            log(f"BQ={bq} BK={bk}: FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    main()
