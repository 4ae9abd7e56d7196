"""Probe: v3 flash_attend_int4 TFLOP/s at 480k prefill chunk shapes.

Round-4 diagnosis: the 480k bench prefill measured 2073 s vs round 3's
866 s at the identical config (bench_results/bench_r4_cold.log). Scoring
IMPROVED 1676 -> 1278 s with the same v3 trip structure, so the suspect is
the prefill kernel at large-base shapes. This times the kernel alone at an
early / mid / late chunk of the 480k ladder (C=482816 capacity, T=16384)
and at the perf-floor shape (C=65536) for cross-checking against
bench_results/tpu_kernel_lane_r4.log (89.3 TF).

Timing: chained-reps slope inside one jit (fori_loop, dynamic trip count),
arrays as jit args (tunnel discipline, NOTES.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from kvzip_tpu.ops.flash_int4 import flash_attend_int4
from kvzip_tpu.ops.quant import quantize_int4

SCALE = 128 ** -0.5
D = 128


def slope(fn, x, arrays, n1=2, n2=6):
    @jax.jit
    def reps(x, arrays, n):
        return jax.lax.fori_loop(0, n, lambda i, o: fn(o, *arrays), x)

    def t(n):
        n = jnp.asarray(n, jnp.int32)
        np.asarray(jax.device_get(reps(x, arrays, n).ravel()[:8]))
        t0 = time.time()
        np.asarray(jax.device_get(reps(x, arrays, n).ravel()[:8]))
        return time.time() - t0

    t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def probe(C, T, base, Hkv=4, G=7, tag="", block_q=256, block_k=512):
    H = Hkv * G
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    v = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    del k, v
    kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    del kq, vq
    args = (kqt, ks[..., 0], kz[..., 0], vqt, vs[..., 0], vz[..., 0],
            jnp.full((Hkv,), base, jnp.int32))
    q = jax.random.normal(key, (T, H, D), jnp.bfloat16)
    flops = 2 * 2 * H * T * (base + T / 2) * D

    sec = slope(
        lambda o, *a: flash_attend_int4(
            o, *a, jnp.asarray(base, jnp.int32), scale=SCALE,
            block_q=block_q, block_k=block_k), q, args)
    print(f"[{tag}] C={C} T={T} base={base} BQ={block_q} BK={block_k}: "
          f"{sec * 1e3:.1f} ms/call, {flops / sec / 1e12:.1f} TF",
          flush=True)
    return sec


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "bq":
        # VERDICT r3 item 8 (prefill MFU): sweep block_q/block_k at the
        # late-chunk 480k shape where most prefill time is spent
        C480 = 482816
        for bq, bk in ((256, 512), (384, 512), (512, 512), (256, 1024),
                       (512, 1024)):
            try:
                probe(C480, 16384, 462848, tag=f"bq{bq}/bk{bk}",
                      block_q=bq, block_k=bk)
            except Exception as e:
                print(f"[bq{bq}/bk{bk}] failed: {type(e).__name__} {e}",
                      flush=True)
    else:
        # perf-floor cross-check (lane measured 89.3 TF here)
        probe(65536, 8192, 65536 - 8192, tag="floor")
        # 480k ladder chunks: early / mid / late
        C480 = 482816
        probe(C480, 16384, 16384, tag="early")
        probe(C480, 16384, 245760, tag="mid")
        probe(C480, 16384, 462848, tag="late")
