"""Decompose the round-5 decode step (megakernel + pool) from a saved
state — the per-step CONSTANT is context-independent, so the default 16k
state attributes the 480k constant too; pass a state base path (or
"480k") to decompose the flagship state directly.

    timeout 1800 python tools/profile_decode_r5.py [16k|480k|<base>]
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

from functools import partial

from kvzip_tpu.config import resolve_config
from kvzip_tpu.engine import Engine
from kvzip_tpu.models.transformer import forward, rms_norm


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    eng = Engine("qwen2.5-7b", kv_type="evict", config=cfg,
                 dtype=jnp.bfloat16, max_new_tokens=256, decode_budget=512,
                 weight_quant="w4a8", kv_quant="int4", embed_quant="int8",
                 flat_decode="on")
    eng.eos_ids = (-1,)
    sel = sys.argv[1] if len(sys.argv) > 1 else "16k"
    base = {"16k": ".bench_state/qwen2.5-7b_16384_w4a8_int4_int8_r0.3",
            "480k": ".bench_state/qwen2.5-7b_480000_w4a8_int4_int8_r0.3",
            }.get(sel, sel)
    st = eng.load_state(base)
    log(f"state loaded ({base}): {st.mem_gb()} GB")
    params = eng.params
    cache = st.cache

    def slope(label, fn, n1, n2):
        fn(n1)
        t0 = time.time(); fn(n1); t1 = time.time() - t0
        fn(n2)
        t0 = time.time(); fn(n2); t2 = time.time() - t0
        ms = (t2 - t1) / (n2 - n1) * 1e3
        log(f"{label:36s} {ms:7.3f} ms/step  (t{n1}={t1 * 1e3:.0f} "
            f"t{n2}={t2 * 1e3:.0f})")
        return ms

    # 1. full decode loop (lm_head + argmax + eos in loop)
    import dataclasses

    def run_loop(n):
        nonlocal cache
        run = eng._decode_loop(n - 1, cache.capacity, eng._impl(st))
        toks, i, done, c2 = run(params, cache, jnp.int32(42))
        cache = dataclasses.replace(c2, tail_len=jnp.zeros((), jnp.int32))
        np.asarray(jax.device_get(i))

    slope("decode loop (mega, lm_head, argmax)", run_loop, 8, 64)

    # 2. forward-only loop (no lm_head/argmax)
    @partial(jax.jit, static_argnames=("n",), donate_argnames=("c",))
    def loop_fwd(params, c, n):
        def body(i, c):
            res = forward(params, cfg, jnp.asarray([42], jnp.int32), c,
                          collect_logits="none", attn_impl="flash",
                          fuse_layer=eng.fuse_layer)
            return res.cache
        return jax.lax.fori_loop(0, n, body, c)

    def run_fwd(n):
        nonlocal cache
        c2 = loop_fwd(params, cache, n)
        cache = dataclasses.replace(c2, tail_len=jnp.zeros((), jnp.int32))
        np.asarray(jax.device_get(cache.seen))

    slope("forward only (no head)", run_fwd, 8, 64)

    # 3. composed (no megakernel) forward-only
    @partial(jax.jit, static_argnames=("n",), donate_argnames=("c",))
    def loop_fwd_nomega(params, c, n):
        def body(i, c):
            res = forward(params, cfg, jnp.asarray([42], jnp.int32), c,
                          collect_logits="none", attn_impl="flash",
                          fuse_layer="off")
            return res.cache
        return jax.lax.fori_loop(0, n, body, c)

    def run_fwd2(n):
        nonlocal cache
        c2 = loop_fwd_nomega(params, cache, n)
        cache = dataclasses.replace(c2, tail_len=jnp.zeros((), jnp.int32))
        np.asarray(jax.device_get(cache.seen))

    slope("forward only (fuse_layer=off)", run_fwd2, 8, 64)

    # 4. pool attention alone (28 layers/step)
    from kvzip_tpu.ops.pool_decode import pool_decode_attend_int4
    L, H, Hkv, D = cfg.num_layers, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q0 = jax.random.normal(jax.random.PRNGKey(0), (1, H, D), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n",))
    def attn_only(q, c, n):
        def step(_, q):
            def body(q, li):
                o = pool_decode_attend_int4(
                    q, c.k_pool_q, c.k_pool_s, c.k_pool_z,
                    c.v_pool_q, c.v_pool_s, c.v_pool_z, c.row_head,
                    c.layer_off, c.layer_rows,
                    c.k_tail[0], c.v_tail[0], c.tail_len,
                    li, scale=D ** -0.5, align=c.align, max_rows=c.max_rows)
                return o, None
            q, _ = jax.lax.scan(body, q, jnp.arange(L, dtype=jnp.int32))
            return q
        return jax.lax.fori_loop(0, n, step, q)

    def run_attn(n):
        np.asarray(jax.device_get(attn_only(q0, cache, n)))

    slope("pool attention (28 layers)", run_attn, 8, 64)

    # 5. lm_head + argmax alone
    head = params.get("lm_head", params["embed"])
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.hidden_size),
                           jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n",))
    def head_only(x, head, fn, n):
        from kvzip_tpu.ops.quant import head_logits

        def body(i, x):
            xf = rms_norm(x, fn, cfg.rms_norm_eps)
            logits = head_logits(head, xf)
            nxt = jnp.argmax(logits[-1])
            return x + (nxt.astype(jnp.bfloat16) * jnp.bfloat16(1e-9))
        return jax.lax.fori_loop(0, n, body, x)

    def run_head(n):
        np.asarray(jax.device_get(head_only(x0, head, params["final_norm"],
                                            n)))

    slope("lm_head + argmax", run_head, 32, 256)


if __name__ == "__main__":
    main()
