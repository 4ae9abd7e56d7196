"""On-chip batched-serving bench: N evicted contexts decoding concurrently
vs single-stream (VERDICT r1 item 8: aggregate > 4x single; VERDICT r4
item 8: the merged-POOL path measured on chip, not just CPU-parity).

Builds N synthetic post-eviction states (32k ctx at ratio 0.3 geometry) in
either the legacy flat-int4 layout or the default POOL layout, ingests one
query per context, then measures:
  - single-stream: sequential eng.generate per state
  - batched: serving.batched_generate over all N

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python tools/bench_serving.py [N] [DECODE] [pool|legacy]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from kvzip_tpu.cache import FlatInt4KV  # noqa: E402
from kvzip_tpu.config import resolve_config  # noqa: E402
from kvzip_tpu.engine import Engine, KVState, _round_flat_rows  # noqa: E402
from kvzip_tpu.serving import batched_generate  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CTX = 32768
RATIO = 0.3
DECODE = int(sys.argv[2]) if len(sys.argv) > 2 else 64
LAYOUT = sys.argv[3] if len(sys.argv) > 3 else "pool"


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_state(eng, cfg, seed):
    L, H, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    rows = int(H * CTX * RATIO)
    r_pad = _round_flat_rows(rows)
    tail_cap = eng.decode_budget
    key = jax.random.PRNGKey(seed)
    rh = np.full((r_pad,), -1, np.int32)
    per = rows // H
    rh[:per * H] = np.repeat(np.arange(H, dtype=np.int32), per)
    cache = FlatInt4KV(
        k_flat_q=jax.random.randint(key, (L, D // 2, r_pad), 0, 255,
                                    jnp.uint8),
        v_flat_q=jax.random.randint(key, (L, D // 2, r_pad), 0, 255,
                                    jnp.uint8),
        k_flat_s=jnp.full((L, r_pad), 0.01, jnp.float32),
        k_flat_z=jnp.full((L, r_pad), -0.05, jnp.float32),
        v_flat_s=jnp.full((L, r_pad), 0.01, jnp.float32),
        v_flat_z=jnp.full((L, r_pad), -0.05, jnp.float32),
        row_head=jnp.asarray(np.broadcast_to(rh, (L, r_pad))),
        k_tail=jnp.zeros((L, H, tail_cap, D), jnp.bfloat16),
        v_tail=jnp.zeros((L, H, tail_cap, D), jnp.bfloat16),
        lengths=jnp.full((L, H), per, jnp.int32),
        tail_len=jnp.zeros((), jnp.int32),
        seen=jnp.asarray(CTX, jnp.int32),
    )
    st = KVState(cache=cache, kv_type="evict", sink=0, ctx_len=CTX,
                 prefill_len=CTX, pruned=True,
                 prefill_ids=np.zeros((1,), np.int32))
    st.snapshot()
    return st


def make_pool_state(eng, cfg, seed):
    """Post-eviction geometry in the default POOL layout (the layout real
    prune() builds since round 4); value-independent decode timing makes a
    synthetic fill equivalent to a real pruned pool."""
    from kvzip_tpu.pool import synthetic_full_pool

    cache = synthetic_full_pool(
        cfg.num_layers, cfg.num_kv_heads, cfg.head_dim,
        per_head_rows=int(CTX * RATIO), tail_cap=eng.decode_budget,
        int4=True, seen=CTX)
    st = KVState(cache=cache, kv_type="evict", sink=0, ctx_len=CTX,
                 prefill_len=CTX, pruned=True,
                 prefill_ids=np.zeros((1,), np.int32))
    st.snapshot()
    return st


def main():
    cfg = resolve_config("qwen2.5-7b")
    eng = Engine("qwen2.5-7b", kv_type="evict", config=cfg,
                 dtype=jnp.bfloat16, max_new_tokens=DECODE,
                 decode_budget=DECODE + 192, weight_quant="w8a8",
                 kv_quant="int4",
                 flat_decode=("auto" if LAYOUT == "pool" else "on"))
    eng.eos_ids = (-1,)

    mk = make_pool_state if LAYOUT == "pool" else make_state
    log(f"layout={LAYOUT} N={N} decode={DECODE}")
    states = [mk(eng, cfg, i) for i in range(N)]
    queries = [eng.apply_template(f"Summarize topic {i}.") for i in range(N)]

    # single-stream (warm then measure one stream)
    eng.generate(queries[0], states[0], max_new_tokens=DECODE)
    t0 = time.time()
    eng.generate(queries[0], states[0], max_new_tokens=DECODE)
    t_single = time.time() - t0
    single_tps = DECODE / t_single
    log(f"single-stream: {t_single * 1e3:.0f} ms for {DECODE} tokens "
        f"= {single_tps:.1f} tok/s")

    # batched (warm then measure)
    batched_generate(eng, queries, states, max_new_tokens=DECODE)
    t0 = time.time()
    outs = batched_generate(eng, queries, states, max_new_tokens=DECODE)
    t_batch = time.time() - t0
    agg_tps = N * DECODE / t_batch
    log(f"batched x{N}: {t_batch * 1e3:.0f} ms for {N}x{DECODE} tokens "
        f"= {agg_tps:.1f} tok/s aggregate ({agg_tps / single_tps:.2f}x "
        f"single-stream)")
    assert len(outs) == N


if __name__ == "__main__":
    main()
