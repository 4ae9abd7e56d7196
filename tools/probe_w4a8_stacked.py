"""Probe the stacked/fused W4A8 linear chain on the chip (VERDICT r2 item 8).

Times a 28-layer scan of the four fused launches per layer (wqkv, wo,
w_gateup, w_down) at decode shape (T=1) and one prefill-chunk shape, vs the
W8A8 equivalent. The r2 per-layer kernel measured 12.8 ms/step at 7B vs 9.98
for W8A8 — the scanned Pallas operand was materialized per layer (a full
weight-stack copy each step). The stacked kernels index the layer via scalar
prefetch instead.

    timeout 1800 python tools/probe_w4a8_stacked.py [T ...]
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
from kvzip_tpu.models import params as params_lib
from kvzip_tpu.ops.quant import int8_linear
from kvzip_tpu.ops.w4a8 import fuse_w4a8_params, w4a8_linear_stacked


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    # timing is value-independent: fabricate constant quantized stacks
    # directly (random init + quantization wastes minutes and transiently
    # OOMs with both models resident)
    from kvzip_tpu.ops.w4a8 import GROUP, _pad_groups

    def w4_stack(IN, OUT):
        Gp, _ = _pad_groups(IN // GROUP)
        return {"q4": jnp.full((L, Gp * GROUP, OUT // 2), 0x5A, jnp.uint8),
                "s": jnp.full((L, Gp, OUT), 1e-3,
                              jnp.dtype(os.environ.get("SCALE_DTYPE",
                                                       "float32"))),
                "z": jnp.full((L, Gp, OUT), -1e-3,
                              jnp.dtype(os.environ.get("SCALE_DTYPE",
                                                       "float32")))}

    def w8_stack(IN, OUT):
        return {"q": jnp.full((L, IN, OUT), 7, jnp.int8),
                "s": jnp.full((L, OUT), 1e-3, jnp.float32)}

    w4 = {"wqkv": w4_stack(D, H * Dh + 2 * Hkv * Dh),
          "wo": w4_stack(H * Dh, D),
          "w_gateup": w4_stack(D, 2 * I),
          "w_down": w4_stack(I, D)}
    gb4 = sum(a.size * a.dtype.itemsize
              for k in w4 for a in w4[k].values()) / 1e9
    log(f"w4a8 linear bytes: {gb4:.2f} GB")

    w8 = {"wq": w8_stack(D, H * Dh), "wk": w8_stack(D, Hkv * Dh),
          "wv": w8_stack(D, Hkv * Dh), "wo": w8_stack(H * Dh, D),
          "w_gate": w8_stack(D, I), "w_up": w8_stack(D, I),
          "w_down": w8_stack(I, D)}
    gb8 = sum(a.size * a.dtype.itemsize
              for k in w8 for a in w8[k].values()) / 1e9
    log(f"w8a8 linear bytes: {gb8:.2f} GB")

    def chain4(x, _w4):
        def layer(carry, l):
            qkv = w4a8_linear_stacked(carry, _w4["wqkv"], l)
            o = w4a8_linear_stacked(qkv[:, :H * Dh], _w4["wo"], l)
            gu = w4a8_linear_stacked(o, _w4["w_gateup"], l)
            d = w4a8_linear_stacked(
                jax.nn.silu(gu[:, :I]) * gu[:, I:], _w4["w_down"], l)
            return d, None
        y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
        return y

    def chain8(x, _w8):
        def layer(carry, lw):
            q = int8_linear(carry, lw["wq"]["q"], lw["wq"]["s"])
            int8_linear(carry, lw["wk"]["q"], lw["wk"]["s"])
            int8_linear(carry, lw["wv"]["q"], lw["wv"]["s"])
            o = int8_linear(q[:, :H * Dh], lw["wo"]["q"], lw["wo"]["s"])
            g = int8_linear(o, lw["w_gate"]["q"], lw["w_gate"]["s"])
            u = int8_linear(o, lw["w_up"]["q"], lw["w_up"]["s"])
            d = int8_linear(jax.nn.silu(g) * u, lw["w_down"]["q"],
                            lw["w_down"]["s"])
            return d, None
        y, _ = jax.lax.scan(layer, x, _w8)
        return y

    REPS = {1: 16, 8: 16}
    for T in [int(a) for a in sys.argv[1:]] or [1, 2304, 16384]:
        reps = REPS.get(T, 2)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((T, D)),
                        jnp.bfloat16)
        for name, fn, w in (("w4a8", chain4, w4),
                            ("w8a8", chain8, w8)):
            # chain reps INSIDE one jit: timing through the tunnel pays
            # ~40-60 ms dispatch per call (NOTES probe discipline)
            # carry the chain output directly (same (T, D) shape): timing is
            # value-independent and nothing can be dead-code-eliminated
            f = jax.jit(lambda x0, _w, n=reps, fn=fn: jax.lax.fori_loop(
                0, n, lambda i, c: fn(c, _w), x0))
            try:
                np.asarray(jax.device_get(f(x, w)))  # compile+run
                t0 = time.time()
                np.asarray(jax.device_get(f(x, w)))
                dt = (time.time() - t0) / reps
                gbs = (gb4 if name == "w4a8" else gb8) / dt
                log(f"T={T:6d} {name}: {dt * 1e3:8.2f} ms per 28-layer "
                    f"chain ({gbs:.0f} GB/s weight read)")
            except Exception as e:
                log(f"T={T:6d} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
