"""Decompose prefill/scoring chunk cost at long context (VERDICT r2 item 3).

The 3B/295k pipeline spends 588 s in scoring vs 476 s prefill, and the
per-chunk prefill times grow ~1.6 s per 16k chunk — ~38x the attention-FLOP
increment the isolated kernel numbers predict. This probe fabricates a dense
Int4KVCache at several fill levels F and times, separately:

- the FULL forward chunk (prefill shape T=16384 and scoring shape T=2304,
  scoring=True for the latter) — the thing the pipeline actually calls;
- flash_attend_int4 alone at the same (T, F);
so the F-dependent non-attention cost (donation copies, layout conversions,
append path) becomes visible as forward(F) - forward(F0) - attention deltas.

    timeout 3000 python tools/probe_scoring.py [model] [capacity]
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

import dataclasses

from kvzip_tpu.cache import init_int4_cache
from kvzip_tpu.config import resolve_config
from kvzip_tpu.models import params as params_lib
from kvzip_tpu.models.transformer import forward
from kvzip_tpu.ops.flash_int4 import flash_attend_int4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-7b"
    # default capacity matches the 480k demo/bench runs so every forward
    # compile hits the persistent jit cache
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 482816
    cfg = resolve_config(model)
    L, Hkv, Dh, H = (cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
                     cfg.num_heads)

    t0 = time.time()
    # w4a8 + int8 embed: the exact 480k demo/bench configuration (compile
    # cache reuse for the non-scoring forwards)
    params, _ = params_lib.prepare_params(
        cfg, model, dtype=jnp.bfloat16, weight_quant="w4a8",
        embed_quant="int8")
    jax.block_until_ready(jax.tree.leaves(params)[0])
    log(f"params ready in {time.time() - t0:.1f}s")

    cache0 = init_int4_cache(cfg, capacity, jnp.bfloat16)
    jax.block_until_ready(cache0.k_q)
    log(f"cache capacity {capacity}: {cache0.mem_bytes() / 1e9:.2f} GB")

    rng = np.random.default_rng(0)

    def at_fill(f):
        return dataclasses.replace(
            cache0, lengths=jnp.full((L, Hkv), f, jnp.int32),
            seen=jnp.asarray(f, jnp.int32))

    fills = [8192, 131072, 262144]

    # ---- full forward chunks (the pipeline's actual per-chunk call)
    for T, scoring in ((16384, False), (2304, True)):
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size - 10, T), jnp.int32)
        for f in fills:
            cache = at_fill(f)
            kw = {}
            if scoring:
                kw = dict(scoring=True,
                          score_start=jnp.asarray(8, jnp.int32),
                          score_len=jnp.asarray(2000, jnp.int32),
                          score_qlen=jnp.asarray(T, jnp.int32),
                          score_width=2048, sink=8)
            res = forward(params, cfg, ids, cache, attn_impl="flash", **kw)
            np.asarray(jax.device_get(res.cache.seen))  # compile+run
            reps = 3
            t0 = time.time()
            c = res.cache
            for _ in range(reps):
                c = dataclasses.replace(
                    c, lengths=jnp.full((L, Hkv), f, jnp.int32),
                    seen=jnp.asarray(f, jnp.int32))
                res = forward(params, cfg, ids, c, attn_impl="flash", **kw)
                c = res.cache
            np.asarray(jax.device_get(c.seen))
            dt = (time.time() - t0) / reps
            log(f"forward T={T:5d} scoring={int(scoring)} F={f:6d}: "
                f"{dt * 1e3:9.1f} ms")

    # ---- attention kernel alone (28 layers' worth, same per-layer arrays),
    # sweeping the KV trip size: 512-column trips leave only ~2 us of MXU
    # work per DMA wait — suspected cause of scoring's ~29 TFLOP/s effective
    # (vs the kernel's isolated 93 at the default block)
    for T in (16384, 2304):
        q = jnp.asarray(rng.standard_normal((T, H, Dh)), jnp.bfloat16)
        for f in fills:
            cache = at_fill(f)
            kq, vq = cache.k_q[0], cache.v_q[0]
            ks, kz = cache.k_s[0, ..., 0], cache.k_z[0, ..., 0]
            vs, vz = cache.v_s[0, ..., 0], cache.v_z[0, ..., 0]
            lens = jnp.full((Hkv,), f, jnp.int32)
            pos0 = jnp.asarray(f, jnp.int32)

            for bk in (512, 1024, 2048, 4096):
                f_att = jax.jit(lambda q, n=L, bk=bk: jax.lax.fori_loop(
                    0, n, lambda i, acc: acc + flash_attend_int4(
                        q, kq, ks, kz, vq, vs, vz, lens, pos0,
                        scale=Dh ** -0.5, block_k=bk).astype(jnp.float32),
                    jnp.zeros((T, H, Dh), jnp.float32)))
                try:
                    np.asarray(jax.device_get(f_att(q)[0, 0, 0]))
                    t0 = time.time()
                    np.asarray(jax.device_get(f_att(q)[0, 0, 0]))
                    dt = time.time() - t0
                    fl = 4 * H * T * f * Dh * L
                    log(f"attention x{L} T={T:5d} F={f:6d} BK={bk:5d}: "
                        f"{dt * 1e3:9.1f} ms ({fl / dt / 1e12:.0f} TFLOP/s)")
                except Exception as e:
                    log(f"attention x{L} T={T:5d} F={f:6d} BK={bk:5d}: "
                        f"FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
