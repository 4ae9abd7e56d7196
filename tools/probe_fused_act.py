"""Chip measurement for the fused W8A8 activation kernels (VERDICT r4
item 4: "the measured comparison on chip decides the default").

Times rmsnorm_quant / silu_mul_quant (ops/fused_act.py, reference QServe
RMSNormGeneral + SiluAndMulQuant, `w8a8kv4_llama.py:126-163`) against the
composed XLA path (rms_norm -> quantize_act_int8 / silu*up -> quant) at 7B
decode and prefill-chunk shapes, chained inside one jit.

    timeout 1200 python tools/probe_fused_act.py
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

from kvzip_tpu.models.transformer import rms_norm
from kvzip_tpu.ops.fused_act import rmsnorm_quant, silu_mul_quant
from kvzip_tpu.ops.quant import quantize_act_int8

D, I = 3584, 18944
EPS = 1e-6


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    np.asarray(jax.device_get(f(*args)))
    t0 = time.time()
    np.asarray(jax.device_get(f(*args)))
    dt = time.time() - t0
    log(f"  {name:28s} {dt * 1e6 / REPS:8.2f} us/op")
    return dt / REPS


REPS = 512


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1, jnp.bfloat16)
    for T in (1, 8):
        x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((T, I)), jnp.bfloat16)
        u = jnp.asarray(rng.standard_normal((T, I)), jnp.bfloat16)
        log(f"T={T}")

        def comp_norm(x, w):
            def body(i, c):
                q, s = quantize_act_int8(rms_norm(x + c * 1e-9, w, EPS))
                return s[0, 0]
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        def fused_norm(x, w):
            def body(i, c):
                q, s = rmsnorm_quant(x + c * 1e-9, w, EPS)
                return s[0, 0]
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        def comp_silu(g, u):
            def body(i, c):
                q, s = quantize_act_int8(jax.nn.silu(g + c * 1e-9) * u)
                return s[0, 0]
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        def fused_silu(g, u):
            def body(i, c):
                q, s = silu_mul_quant(g + c * 1e-9, u)
                return s[0, 0]
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

        a = timeit("rmsnorm+quant XLA", comp_norm, x, w)
        b = timeit("rmsnorm_quant pallas", fused_norm, x, w)
        c = timeit("silu-mul+quant XLA", comp_silu, g, u)
        d = timeit("silu_mul_quant pallas", fused_silu, g, u)
        log(f"  -> norm fused speedup {a / b:.2f}x, "
            f"silu fused speedup {c / d:.2f}x; per 28-layer step "
            f"composed {(2 * a + c) * 28 * 1e6:.0f} us vs fused "
            f"{(2 * b + d) * 28 * 1e6:.0f} us")


if __name__ == "__main__":
    main()
