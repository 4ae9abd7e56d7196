"""Decompose one post-eviction decode step at 7B/131k (VERDICT r2 item 1).

Builds the FlatInt4KV state directly with random data (no prefill needed) and
times: the full decode loop, forward with/without lm_head, flat attention
alone, the w8a8 linear stack alone, lm_head alone, and per-shape int8 matmul
microbenchmarks. Run on the TPU chip:

    timeout 3000 python tools/profile_decode.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

from kvzip_tpu.cache import FlatInt4KV
from kvzip_tpu.config import resolve_config
from kvzip_tpu.engine import Engine, KVState
from kvzip_tpu.models.transformer import forward, rms_norm
from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4
from kvzip_tpu.ops.quant import int8_linear

R_PAD = 163840          # 4 heads x 39321 kept rows (+sink), rounded to 8192
CTX = 131072
TAIL_CAP = 320
STEPS = 64


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, reps=3):
    fn()  # warmup (compile)
    jax.effects_barrier()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.device_get(jax.tree.leaves(out)[0]))
    dt = (time.time() - t0) / reps
    log(f"{name:34s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    cfg = resolve_config("qwen2.5-7b")
    eng = Engine("qwen2.5-7b", kv_type="evict", config=cfg,
                 dtype=jnp.bfloat16, max_new_tokens=STEPS,
                 decode_budget=TAIL_CAP, weight_quant="w8a8",
                 kv_quant="int4", flat_decode="on")
    eng.eos_ids = (-1,)
    params = eng.params
    L, Hkv, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    H = cfg.num_heads

    key = jax.random.PRNGKey(0)
    rows_per_head = R_PAD // Hkv
    row_head = np.repeat(np.arange(Hkv, dtype=np.int32), rows_per_head)
    cache = FlatInt4KV(
        k_flat_q=jax.random.randint(key, (L, D // 2, R_PAD), 0, 255,
                                    jnp.uint8),
        v_flat_q=jax.random.randint(key, (L, D // 2, R_PAD), 0, 255,
                                    jnp.uint8),
        # f32 like the real build (cache.py): a bf16 fabrication would add a
        # whole-array cast per scan iteration and distort the measurement
        k_flat_s=jnp.full((L, R_PAD), 0.01, jnp.float32),
        k_flat_z=jnp.full((L, R_PAD), -0.05, jnp.float32),
        v_flat_s=jnp.full((L, R_PAD), 0.01, jnp.float32),
        v_flat_z=jnp.full((L, R_PAD), -0.05, jnp.float32),
        row_head=jnp.asarray(np.broadcast_to(row_head, (L, R_PAD))),
        k_tail=jnp.zeros((L, Hkv, TAIL_CAP, D), jnp.bfloat16),
        v_tail=jnp.zeros((L, Hkv, TAIL_CAP, D), jnp.bfloat16),
        lengths=jnp.full((L, Hkv), rows_per_head, jnp.int32),
        tail_len=jnp.zeros((), jnp.int32),
        seen=jnp.asarray(CTX, jnp.int32),
    )
    log(f"flat cache: {cache.mem_bytes() / 1e9:.2f} GB, r_pad={R_PAD}")

    # ---- 1. full decode loop (the bench number) ----
    run = eng._decode_loop(STEPS - 1, cache.capacity, "flash")

    def full_loop():
        nonlocal cache
        tokens, n, done, cache2 = run(params, cache, jnp.int32(42))
        cache = dataclasses_replace_tail(cache2)
        return tokens

    import dataclasses

    def dataclasses_replace_tail(c):
        return dataclasses.replace(c, tail_len=jnp.zeros((), jnp.int32))

    dt = timeit("decode loop (64 steps)", full_loop, reps=2)
    log(f"  -> {dt / STEPS * 1e3:.2f} ms/tok")

    run8 = eng._decode_loop(7, cache.capacity, "flash")

    def loop8():
        nonlocal cache
        tokens, n, done, cache2 = run8(params, cache, jnp.int32(42))
        cache = dataclasses_replace_tail(cache2)
        return tokens

    import time as _t2
    loop8()
    t0 = _t2.time(); jax.device_get(loop8()); t8f = _t2.time() - t0
    t0 = _t2.time(); jax.device_get(full_loop()); t64f = _t2.time() - t0
    log(f"full loop slope: {(t64f - t8f) / 56 * 1e3:.2f} ms/step "
        f"(t8={t8f * 1e3:.0f} t64={t64f * 1e3:.0f})")

    # ---- 1b. fixed-token loop (no lm_head/argmax): isolates forward ----
    from functools import partial as _p

    @_p(jax.jit, static_argnames=("n",), donate_argnames=("c",))
    def loop_fixed(params, c, n):
        def body(i, c):
            res = forward(params, cfg, jnp.asarray([42], jnp.int32), c,
                          collect_logits="none", attn_impl="flash")
            return res.cache
        return jax.lax.fori_loop(0, n, body, c)

    def fixed_loop(n):
        nonlocal cache
        c2 = loop_fixed(params, cache, n)
        cache = dataclasses_replace_tail(c2)
        return cache.tail_len

    import time as _t
    fixed_loop(8)
    t0 = _t.time(); jax.device_get(fixed_loop(8)); t8 = _t.time() - t0
    fixed_loop(64)
    t0 = _t.time(); jax.device_get(fixed_loop(64)); t64 = _t.time() - t0
    log(f"fixed-token loop slope: {(t64 - t8) / 56 * 1e3:.2f} ms/step "
        f"(t8={t8 * 1e3:.0f} t64={t64 * 1e3:.0f}) — forward-only cost")

    # ---- 2. forward single step, with and without lm_head ----
    def fwd(collect):
        nonlocal cache
        for _ in range(8):
            res = forward(params, cfg, jnp.asarray([42], jnp.int32), cache,
                          collect_logits=collect, attn_impl="flash")
            cache = res.cache
        cache = dataclasses_replace_tail(cache)
        return res.logits if res.logits is not None else res.cache.tail_len

    dt = timeit("forward x8 (with lm_head)", lambda: fwd("last"))
    log(f"  -> {dt / 8 * 1e3:.2f} ms/step")
    dt = timeit("forward x8 (no lm_head)", lambda: fwd("none"))
    log(f"  -> {dt / 8 * 1e3:.2f} ms/step")

    # ---- 3. flat attention alone (28 layers, chained x8) ----
    q0 = jax.random.normal(key, (1, H, D), jnp.bfloat16)

    @jax.jit
    def attn_only(q, c):
        # stacked-layer convention (like the forward): no per-layer slicing
        def body(q, li):
            o = flat_decode_attend_int4(
                q, c.k_flat_q, c.k_flat_s, c.k_flat_z,
                c.v_flat_q, c.v_flat_s, c.v_flat_z, c.row_head,
                c.k_tail[0], c.v_tail[0], c.tail_len,
                scale=D ** -0.5, layer=li)
            return o, None
        for _ in range(8):
            q, _ = jax.lax.scan(body, q, jnp.arange(L, dtype=jnp.int32))
        return q

    dt = timeit("flat attention x8 (28 layers)", lambda: attn_only(q0, cache))
    log(f"  -> {dt / 8 * 1e3:.2f} ms/step")

    # ---- 4. w8a8 linear stack alone (28 layers, chained x8) ----
    x0 = jax.random.normal(key, (1, cfg.hidden_size), jnp.bfloat16)

    def _lin(x, w, b=None):
        if isinstance(w, dict):
            return int8_linear(x, w["q"], w["s"], b)
        y = x @ w
        return y if b is None else y + b

    @jax.jit
    def linears_only(x, lp):

        def body(x, wp):
            h = rms_norm(x, wp["ln_attn"], cfg.rms_norm_eps)
            q = _lin(h, wp["wq"], wp.get("bq"))
            k = _lin(h, wp["wk"], wp.get("bk"))
            v = _lin(h, wp["wv"], wp.get("bv"))
            att = q[:, :cfg.hidden_size] + k.sum() + v.sum()
            x = x + _lin(att, wp["wo"])
            h2 = rms_norm(x, wp["ln_mlp"], cfg.rms_norm_eps)
            mlp = _lin(jax.nn.silu(_lin(h2, wp["w_gate"]))
                       * _lin(h2, wp["w_up"]), wp["w_down"])
            return x + mlp, None

        for _ in range(8):
            x, _ = jax.lax.scan(body, x, lp)
        return x

    dt = timeit("w8a8 linears x8 (28 layers)",
                lambda: linears_only(x0, params["layers"]))
    log(f"  -> {dt / 8 * 1e3:.2f} ms/step")

    # ---- 5. lm_head alone ----
    head = params.get("lm_head", params["embed"])

    @jax.jit
    def lm_head_only(x, head, fn):
        for _ in range(8):
            xf = rms_norm(x, fn, cfg.rms_norm_eps)
            logits = xf @ head.T
            x = x + logits[:, :cfg.hidden_size].astype(x.dtype) * 1e-6
        return x

    dt = timeit("lm_head x8",
                lambda: lm_head_only(x0, head, params["final_norm"]))
    log(f"  -> {dt / 8 * 1e3:.2f} ms/step "
        f"(bf16 head = {head.size * 2 / 1e9:.2f} GB)")

    # ---- 6. int8 matmul micro per shape ----
    for (i, o, n) in [(3584, 3584, "wq/wo"), (3584, 18944, "gate/up"),
                      (18944, 3584, "down"), (3584, 512, "wk/wv")]:
        wq = jax.random.randint(key, (i, o), -127, 127, jnp.int8)
        ws = jnp.ones((o,), jnp.float32)
        x = jax.random.normal(key, (1, i), jnp.bfloat16)

        @partial(jax.jit, static_argnames=("i",))
        def chain(x, wq, ws, i):
            for _ in range(32):
                y = int8_linear(x, wq, ws)
                x = y[:, :1] * 1e-6 + x if y.shape[1] < i else \
                    y[:, :i] * 1e-6 + x
            return x

        dt = timeit(f"int8_linear {n} ({i}x{o}) x32",
                    lambda: chain(x, wq, ws, i))
        gb = i * o / 1e9
        log(f"  -> {dt / 32 * 1e3:.3f} ms each = {gb / (dt / 32):.0f} GB/s")

        # bf16-compute variant: weights still int8 in HBM, dequant fused
        @partial(jax.jit, static_argnames=("i",))
        def chain_bf16(x, wq, ws, i):
            for _ in range(32):
                y = (x @ wq.astype(jnp.bfloat16)) * ws.astype(jnp.bfloat16)
                x = y[:, :1] * 1e-6 + x if y.shape[1] < i else \
                    y[:, :i] * 1e-6 + x
            return x

        dt = timeit(f"bf16-deq matmul {n} x32",
                    lambda: chain_bf16(x, wq, ws, i))
        log(f"  -> {dt / 32 * 1e3:.3f} ms each = {gb / (dt / 32):.0f} GB/s")


if __name__ == "__main__":
    main()
