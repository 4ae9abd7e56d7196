"""On-chip probe: W4A8 Pallas matvec vs XLA int8_linear at decode shapes.

Decision gate for wiring weight_quant="w4a8" into the engine: the int4
kernel must beat int8 by ~1.5x+ on the large MLP shapes (it halves HBM
bytes; VPU nibble costs eat some of that back).

    timeout 1800 python tools/probe_w4a8.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

from kvzip_tpu.ops.quant import int8_linear, quantize_weight_int8
from kvzip_tpu.ops.w4a8 import quantize_weight_int4, w4a8_matmul


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(fn, n1=8, n2=32):
    """Chained-reps slope timing (tunnel-dispatch free)."""
    fn(n1)
    fn(n2)
    t0 = time.time(); jax.block_until_ready(fn(n1)); t1 = time.time() - t0
    t0 = time.time(); jax.block_until_ready(fn(n2)); t2 = time.time() - t0
    return (t2 - t1) / (n2 - n1)


def main():
    key = jax.random.PRNGKey(0)
    shapes = [(3584, 4608, "qkv-fused"), (3584, 3584, "wo"),
              (3584, 18944, "gate/up"), (18944, 3584, "down")]
    for T in (1, 16):
        log(f"==== T={T} ====")
        for IN, OUT, name in shapes:
            w = jax.random.normal(key, (IN, OUT), jnp.float32) * 0.02
            x = jax.random.normal(key, (T, IN), jnp.bfloat16)
            w8 = quantize_weight_int8(w)
            w4 = quantize_weight_int4(w)

            @partial(jax.jit, static_argnames=("n",))
            def chain8(x, wq, ws, n):
                for _ in range(n):
                    y = int8_linear(x, wq, ws)
                    x = x + y[:, :IN] * 1e-6 if OUT >= IN else \
                        x + jnp.pad(y, ((0, 0), (0, IN - OUT))) * 1e-6
                return x

            @partial(jax.jit, static_argnames=("n",))
            def chain4(x, q4, s, z, n):
                for _ in range(n):
                    y = w4a8_matmul(x, q4, s, z)
                    x = x + y[:, :IN] * 1e-6 if OUT >= IN else \
                        x + jnp.pad(y, ((0, 0), (0, IN - OUT))) * 1e-6
                return x

            dt8 = slope(lambda n: chain8(x, w8["q"], w8["s"], n))
            dt4 = slope(lambda n: chain4(x, w4["q4"], w4["s"], w4["z"], n))
            gb8 = IN * OUT / 1e9
            gb4 = IN * OUT / 2e9 + 2 * (IN // 128) * OUT * 4 / 1e9
            log(f"{name:10s} int8 {dt8 * 1e6:8.1f} us ({gb8 / dt8:5.0f} GB/s)"
                f" | int4 {dt4 * 1e6:8.1f} us ({gb4 / dt4:5.0f} GB/s)"
                f" | speedup {dt8 / dt4:4.2f}x")

            # parity spot check
            y8 = int8_linear(x, w8["q"], w8["s"])
            y4 = w4a8_matmul(x, w4["q4"], w4["s"], w4["z"])
            yref = x.astype(jnp.float32) @ w
            e8 = float(jnp.abs(y8.astype(jnp.float32) - yref).max())
            e4 = float(jnp.abs(y4.astype(jnp.float32) - yref).max())
            log(f"{'':10s} |err| int8 {e8:.4f}  int4 {e4:.4f} "
                f"(ref max {float(jnp.abs(yref).max()):.3f})")


if __name__ == "__main__":
    main()
