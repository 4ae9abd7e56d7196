"""On-chip timing for the reworked flat decode kernels (NN + quant-folded).

Times a 28-layer scan of the int4 and bf16 flat decode attention at the
7B/131k post-eviction geometry, passing all arrays as scan inputs (NEVER
close over big arrays — the axon tunnel 413s on constant-laden payloads).

Run: timeout 3000 python tools/probe_flat2.py [BLK]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.ops.flat_decode import flat_decode_attend, flat_decode_attend_int4  # noqa: E402

L, H, Hkv, D = 28, 28, 4, 128
R = 163840
TCAP = 320
BLK = int(sys.argv[1]) if len(sys.argv) > 1 else 8192


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    rows_per_head = R // Hkv
    row_head = np.repeat(np.arange(Hkv, dtype=np.int32), rows_per_head)
    rh = jnp.asarray(np.broadcast_to(row_head, (L, R)))
    kq = jax.random.randint(key, (L, D // 2, R), 0, 255, jnp.uint8)
    vq = jax.random.randint(key, (L, R, D // 2), 0, 255, jnp.uint8)
    ks = jnp.full((L, R), 0.01, jnp.bfloat16)
    kz = jnp.full((L, R), -0.05, jnp.bfloat16)
    kt = jnp.zeros((L, Hkv, TCAP, D), jnp.bfloat16)
    tail_len = jnp.zeros((), jnp.int32)
    q0 = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    scale = D ** -0.5

    @jax.jit
    def run_int4(q, kq, ks, kz, vq, vs, vz, rh, kt, vt, dummy):
        def rep(q, _):
            def body(qc, xs):
                kq_, ks_, kz_, vq_, vs_, vz_, rh_ = xs
                o = flat_decode_attend_int4(
                    qc, kq_, ks_, kz_, vq_, vs_, vz_, rh_, kt[0], vt[0],
                    tail_len, scale=scale, block=BLK)
                return o, None
            q, _ = jax.lax.scan(body, q, (kq, ks, kz, vq, vs, vz, rh))
            return q, None
        q, _ = jax.lax.scan(rep, q, dummy)
        return q

    def timed(reps):
        t0 = time.time()
        jax.device_get(run_int4(q0, kq, ks, kz, vq, ks, kz, rh, kt, kt,
                                jnp.zeros((reps,))))
        return time.time() - t0

    try:
        timed(2)
        t2 = timed(2)
        timed(10)
        t10 = timed(10)
        log(f"int4 BLK={BLK}: per-28-layer-step {(t10 - t2) / 8 * 1e3:.2f} ms"
            f" (t2={t2 * 1e3:.0f} t10={t10 * 1e3:.0f})")
    except Exception as e:
        log(f"int4 BLK={BLK} FAILED: {str(e)[:500]}")

    # bf16 flat at same live bytes budget? use R/ some. Just same R for rate.
    kf = jax.random.normal(key, (L, D, R), jnp.bfloat16)
    vf = jax.random.normal(key, (L, R, D), jnp.bfloat16)

    @jax.jit
    def run_bf16(q, kf, vf, rh, kt, vt, dummy):
        def rep(q, _):
            def body(qc, xs):
                kf_, vf_, rh_ = xs
                o = flat_decode_attend(qc, kf_, vf_, rh_, kt[0], vt[0],
                                       tail_len, scale=scale, block=BLK)
                return o, None
            q, _ = jax.lax.scan(body, q, (kf, vf, rh))
            return q, None
        q, _ = jax.lax.scan(rep, q, dummy)
        return q

    def timed_bf(reps):
        t0 = time.time()
        jax.device_get(run_bf16(q0, kf, vf, rh, kt, kt, jnp.zeros((reps,))))
        return time.time() - t0

    try:
        timed_bf(2)
        t2 = timed_bf(2)
        timed_bf(10)
        t10 = timed_bf(10)
        log(f"bf16 BLK={BLK}: per-28-layer-step {(t10 - t2) / 8 * 1e3:.2f} ms"
            f" (t2={t2 * 1e3:.0f} t10={t10 * 1e3:.0f})")
    except Exception as e:
        log(f"bf16 BLK={BLK} FAILED: {str(e)[:500]}")


if __name__ == "__main__":
    main()
