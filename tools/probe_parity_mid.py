"""Mid-size ON-CHIP parity + single-call timing for flash_attend_int4 v2.

Parity vs attend_blockwise_int4 at T=2048, base=32768 (big enough to
exercise many DMA blocks), then single-call wall times at the bench
geometry to sanity-check the chained-probe numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_parity_mid.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from kvzip_tpu.ops.attention import attend_blockwise_int4  # noqa: E402
from kvzip_tpu.ops.flash_int4 import flash_attend_int4  # noqa: E402
from kvzip_tpu.ops.quant import quantize_int4  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


Hkv, G, D = 4, 7, 128
H = Hkv * G
C, T, BASE = 36864, 2048, 32768

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((Hkv, C, D)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((Hkv, C, D)) * 0.3, jnp.bfloat16)
lens = jnp.full((Hkv,), BASE, jnp.int32)
kq, ks, kz = quantize_int4(k, pack="split")
vq, vs, vz = quantize_int4(v, pack="split")

got = flash_attend_int4(
    q, jnp.swapaxes(kq, 1, 2), ks[..., 0], kz[..., 0],
    jnp.swapaxes(vq, 1, 2), vs[..., 0], vz[..., 0], lens,
    jnp.asarray(BASE, jnp.int32), scale=D ** -0.5)
got = np.asarray(jax.device_get(got), np.float32)

want = attend_blockwise_int4(q, kq, ks, kz, vq, vs, vz, lens, None,
                             scale=D ** -0.5)
want = np.asarray(jax.device_get(want), np.float32)
err = np.abs(got - want).max()
log(f"parity T={T} base={BASE}: max abs err {err:.5f} "
    f"(mean |want| {np.abs(want).mean():.3f})")

# single-call wall time at the bench geometry (no chaining):
C2, T2, BASE2 = 147456, 16384, 114688
kq2 = jax.random.randint(jax.random.PRNGKey(1), (Hkv, D // 2, C2), 0, 255,
                         jnp.uint8)
vq2 = jax.random.randint(jax.random.PRNGKey(2), (Hkv, D // 2, C2), 0, 255,
                         jnp.uint8)
s2 = jnp.full((Hkv, C2), 0.01, jnp.bfloat16)
z2 = jnp.full((Hkv, C2), -0.05, jnp.bfloat16)
q2 = jax.random.normal(jax.random.PRNGKey(3), (T2, H, D), jnp.bfloat16)
lens2 = jnp.full((Hkv,), BASE2, jnp.int32)


def one_call():
    o = flash_attend_int4(q2, kq2, s2, z2, vq2, s2, z2, lens2,
                          jnp.asarray(BASE2, jnp.int32), scale=D ** -0.5)
    return np.asarray(jax.device_get(o[0, 0, :4]))


one_call()
t0 = time.time(); one_call(); t1 = time.time() - t0
t0 = time.time(); one_call(); t2 = time.time() - t0
log(f"single-layer call T={T2} base={BASE2}: {t1 * 1e3:.0f} / "
    f"{t2 * 1e3:.0f} ms  (expected ~310 ms at 93 TF/s incl ~40 ms fixed)")
