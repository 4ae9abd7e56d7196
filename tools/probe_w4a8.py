"""On-chip probe: W4A8 vs W8A8 decode linears at the REAL access pattern.

A single weight matrix looped in-place fits in VMEM and stops reading HBM —
useless as a decode proxy. This probe scans a full 28-layer stacked
parameter set (6.2 GB int8 / 3.3 GB int4), exactly like the model's
lax.scan, and times n chained scans inside one jit (slope over n, tunnel-
dispatch free).

Decision gate for the w4a8 flagship bench config.

    timeout 2400 python tools/probe_w4a8.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.ops.quant import int8_linear, quantize_weight_int8
from kvzip_tpu.ops.w4a8 import quantize_weight_int4, w4a8_matmul

L = 28
D, HD, KVD, I = 3584, 4096, 512, 18944  # qwen2.5-7b-ish shapes


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_stack(key, quant_fn):
    """Layer-by-layer fabrication: a whole-stack f32 normal would need a
    7.6 GB transient per weight (OOM next to the stacks themselves)."""
    shapes = dict(wq=(L, D, HD), wk=(L, D, KVD), wv=(L, D, KVD),
                  wo=(L, HD, D), w_gate=(L, D, I), w_up=(L, D, I),
                  w_down=(L, I, D))
    out = {}
    for i, (n, s) in enumerate(shapes.items()):
        Ls, IN, OUT = s
        sample = jax.eval_shape(quant_fn, jax.ShapeDtypeStruct(
            (IN, OUT), jnp.bfloat16))
        bufs = {k: jnp.zeros((Ls, *a.shape), a.dtype)
                for k, a in sample.items()}

        @partial(jax.jit, donate_argnums=(0,))
        def fill(bufs, k, l, IN=IN, OUT=OUT):
            w = (jax.random.normal(k, (IN, OUT), jnp.float32) * 0.02
                 ).astype(jnp.bfloat16)
            q = quant_fn(w)
            return {kk: jax.lax.dynamic_update_slice(
                bufs[kk], q[kk][None].astype(bufs[kk].dtype),
                (l,) + (0,) * q[kk].ndim) for kk in bufs}

        for l in range(Ls):
            bufs = fill(bufs, jax.random.fold_in(key, i * 100 + l),
                        jnp.int32(l))
        jax.block_until_ready(bufs)
        out[n] = bufs
    return out


def lin(x, w):
    if "q4" in w:
        return w4a8_matmul(x, w["q4"], w["s"], w["z"])
    return int8_linear(x, w["q"], w["s"])


def layer_chain(x, wp):
    q = lin(x, {k: v for k, v in wp["wq"].items()})
    k = lin(x, wp["wk"])
    v = lin(x, wp["wv"])
    att = q + k.sum() + v.sum()          # (T, HD)
    x = x + lin(att, wp["wo"])
    mlp = lin(jax.nn.silu(lin(x, wp["w_gate"])) * lin(x, wp["w_up"]),
              wp["w_down"])
    return x + mlp


@partial(jax.jit, static_argnames=("n",))
def run_scan(x, stack, n):
    def body(x, wp):
        return layer_chain(x, wp), None

    def rep(i, x):
        y, _ = jax.lax.scan(body, x, stack)
        return y

    return jax.lax.fori_loop(0, n, rep, x)


def slope(fn, n1=4, n2=16):
    # device_get, not block_until_ready: the axon tunnel does not
    # synchronize execution on block_until_ready (NOTES.md gotcha)
    np.asarray(jax.device_get(fn(n1)))
    np.asarray(jax.device_get(fn(n2)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time(); np.asarray(jax.device_get(fn(n1)))
        t1 = time.time() - t0
        t0 = time.time(); np.asarray(jax.device_get(fn(n2)))
        t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    key = jax.random.PRNGKey(0)
    gb8 = L * (D * HD + 2 * D * KVD + HD * D + 2 * D * I + I * D) / 1e9
    gb4 = gb8 / 2 + L * (2 * (D // 128) * (HD + 2 * KVD + D + 2 * I)
                         + 2 * (I // 128) * D) * 4 / 1e9

    for tag, qfn, gb in (("int8", quantize_weight_int8, gb8),
                         ("int4", quantize_weight_int4, gb4)):
        stack = make_stack(key, qfn)
        for T in (1, 16):
            x = jax.random.normal(key, (T, D), jnp.bfloat16)
            dt = slope(lambda n: run_scan(x, stack, n))
            log(f"{tag} T={T:2d}: {dt * 1e3:7.2f} ms / 28-layer step "
                f"({gb / dt:5.0f} GB/s over {gb:.2f} GB)")
        del stack
        import gc
        gc.collect()


if __name__ == "__main__":
    main()
