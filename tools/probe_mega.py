"""Chip probe: per-layer fused megakernel chain vs composed v2 chain.

    timeout 1800 python tools/probe_mega.py
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
from kvzip_tpu.ops.w4a8_fused import w4a8_layer_fused


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def w4t(IN, OUT):
        G = IN // 128
        Gp = -(-G // 8) * 8
        return {"q4": jnp.full((L, IN, OUT // 2), 0x5A, jnp.uint8),
                "s2": jnp.full((L, 2, Gp, OUT // 2), 1e-3, jnp.bfloat16),
                "z2": jnp.full((L, 2, Gp, OUT // 2), -1e-3, jnp.bfloat16)}

    w = dict(wo=w4t(H * Dh, D), wgu=w4t(D, 2 * I), wdn=w4t(I, D),
             wqkv=w4t(D, H * Dh + 2 * Hkv * Dh),
             lnm=jnp.full((L, 1, D), 1.0, jnp.bfloat16),
             lna=jnp.full((L, 1, D), 1.0, jnp.bfloat16))
    gb = sum(a.size * a.dtype.itemsize
             for k in ("wo", "wgu", "wdn", "wqkv")
             for a in w[k].values()) / 1e9
    log(f"mega weight bytes: {gb:.2f} GB")

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, D)) * .1,
                     jnp.bfloat16)
    attn = jnp.asarray(np.random.default_rng(1).standard_normal((1, H * Dh))
                       * .1, jnp.bfloat16)

    def make_chain(ghb):
        def chain(x, _w):
            def layer(carry, l):
                xc, qkv = carry
                xn, qn = w4a8_layer_fused(
                    xc, attn + qkv[:, :H * Dh].astype(attn.dtype)
                    * jnp.bfloat16(1e-3),
                    _w["lnm"], _w["lna"], _w["wo"], _w["wgu"], _w["wdn"],
                    _w["wqkv"], l, eps=1e-6, g_hb_target=ghb)
                return (xn, qn), None
            qkv0 = jnp.zeros((1, H * Dh + 2 * Hkv * Dh), x.dtype)
            (xn, _), _ = jax.lax.scan(layer, (x, qkv0),
                                      jnp.arange(L, dtype=jnp.int32))
            return xn
        return chain

    reps = 16
    variants = [int(a) for a in sys.argv[1:]] or [4736]
    for ghb in variants:
        chain = make_chain(ghb)
        f = jax.jit(lambda x, _w, chain=chain: jax.lax.fori_loop(
            0, reps, lambda i, c: chain(c, _w), x))
        t0 = time.time()
        np.asarray(jax.device_get(f(x0, w)))
        tc = time.time() - t0
        t0 = time.time()
        np.asarray(jax.device_get(f(x0, w)))
        dt = (time.time() - t0) / reps
        log(f"mega chain g_hb={ghb}: {dt * 1e3:.2f} ms per 28-layer step "
            f"({gb / dt:.0f} GB/s) [compile+1st {tc:.0f}s]  "
            f"(composed v2 chain: 7.28 ms)")


if __name__ == "__main__":
    main()
