"""Decompose the merged-batch decode step at the serving-bench geometry.

    timeout 2400 python tools/probe_merged.py [B]
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo/tools")

from bench_serving import make_state  # noqa: E402
from kvzip_tpu.config import resolve_config  # noqa: E402
from kvzip_tpu.engine import Engine  # noqa: E402
from kvzip_tpu.serving import _merge_flat  # noqa: E402
from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4, _pick_block  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def log(m):
    print(m, file=sys.stderr, flush=True)


def slope(fn, n1=8, n2=40):
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
    cfg = resolve_config("qwen2.5-7b")
    eng = Engine("qwen2.5-7b", kv_type="evict", config=cfg,
                 dtype=jnp.bfloat16, max_new_tokens=8, decode_budget=256,
                 weight_quant="w8a8", kv_quant="int4", flat_decode="on")
    H, Hkv, Dh, L = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.num_layers
    states = [make_state(eng, cfg, i) for i in range(B)]
    m = _merge_flat([st.cache for st in states])
    R = m["row_head"].shape[-1]
    log(f"B={B} R_total={R} BLK={_pick_block(R, 8192, B * H)}")

    flat = (m["k_flat_q"], m["k_flat_s"], m["k_flat_z"],
            m["v_flat_q"], m["v_flat_s"], m["v_flat_z"])
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (1, B * H, Dh), jnp.bfloat16)
    kt0 = m["k_tail"][0]
    vt0 = m["v_tail"][0]
    lens = m["tail_lens"] + 8

    # 1. merged attention kernel alone, 28 layers, chained n times
    @partial(jax.jit, static_argnames=("n",))
    def attn_chain(q, n):
        def rep(i, q):
            def body(q, li):
                o = flat_decode_attend_int4(
                    q, *flat, m["row_head"], kt0, vt0, lens,
                    scale=Dh ** -0.5, layer=li)
                return o, None
            q, _ = jax.lax.scan(body, q, jnp.arange(L, dtype=jnp.int32))
            return q
        return jax.lax.fori_loop(0, n, rep, q)

    dt = slope(lambda n: attn_chain(q0, n))
    gb = (2 * 64 * R + R * 4 * 4 + R * 4) * L / 1e9 / L  # per layer bytes
    log(f"merged attention (28L): {dt * 1e3:7.2f} ms/step "
        f"({gb * L / dt:5.0f} GB/s)")

    # 2. head_logits alone
    from kvzip_tpu.ops.quant import head_logits
    x0 = jax.random.normal(key, (B, cfg.hidden_size), jnp.bfloat16)
    head = eng.params.get("lm_head", eng.params["embed"])

    @partial(jax.jit, static_argnames=("n",))
    def head_chain(x, n):
        def rep(i, x):
            lg = head_logits(head, x)
            return x + lg[:, :cfg.hidden_size].astype(x.dtype) * 1e-6
        return jax.lax.fori_loop(0, n, rep, x)

    dt = slope(lambda n: head_chain(x0, n))
    log(f"lm_head (B={B}): {dt * 1e3:7.2f} ms/step")

    # 3. tail append alone (28 layers)
    from kvzip_tpu.cache import append_layer
    kt_all = m["k_tail"]
    vt_all = m["v_tail"]
    knew = jax.random.normal(key, (1, B * Hkv, Dh), jnp.bfloat16)

    @partial(jax.jit, static_argnames=("n",))
    def app_chain(kt, vt, n):
        def rep(i, c):
            kt, vt = c
            def body(c2, li):
                kt, vt = c2
                k1, v1 = append_layer(kt[li], vt[li], lens, knew, knew)
                return (kt.at[li].set(k1), vt.at[li].set(v1)), None
            (kt, vt), _ = jax.lax.scan(body, (kt, vt),
                                       jnp.arange(L, dtype=jnp.int32))
            return (kt, vt)
        return jax.lax.fori_loop(0, n, rep, (kt, vt))[0]

    dt = slope(lambda n: app_chain(kt_all, vt_all, n))
    log(f"tail appends (28L): {dt * 1e3:7.2f} ms/step "
        f"(incl. non-donated carry copies)")


if __name__ == "__main__":
    main()
