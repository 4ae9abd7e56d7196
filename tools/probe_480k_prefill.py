"""Bisect the 480k demo stall (NOTES session D): run the exact demo-CLI
engine setup, then prefill chunk-by-chunk with a stamp after every chunk
(block_until_ready via device_get of a scalar — block_until_ready alone does
not sync through the axon tunnel, NOTES "probe discipline").

Two independent `cli demo --ctx_tokens 480000` runs reached "Before Prefill"
and then sat at ~0% host CPU with no output for 30+ min; the same kernels
complete at 288k via bench.py. This probe shows WHICH chunk (i.e. first
compile vs later execute) hangs.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
        python tools/probe_480k_prefill.py [ctx_tokens]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from kvzip_tpu.engine import Engine

CTX = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
CHUNK = 16384


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    t0 = time.time()
    eng = Engine("qwen2.5-7b", kv_type="evict", kv_quant="int4",
                 weight_quant="w8a8", embed_quant="int8",
                 max_new_tokens=64, decode_budget=64 + 256)
    log(f"engine ready in {time.time() - t0:.1f}s")

    rng = np.random.default_rng(42)
    ctx_ids = rng.integers(1, eng.config.vocab_size - 10,
                           size=CTX).astype(np.int32)

    # replicate Engine.prefill's setup, but stamp each chunk
    prefill_ids = np.concatenate([eng.sys_prompt_ids, ctx_ids])
    sink = int(len(eng.sys_prompt_ids))
    prefill_len = int(len(prefill_ids))
    extra = max(eng.score_q_pad, eng.decode_budget)
    from kvzip_tpu.cache import init_int4_cache
    from kvzip_tpu.engine import KVState, _round_up
    capacity = _round_up(prefill_len + extra, eng.capacity_granularity)
    log(f"capacity {capacity} rows/head, init cache...")
    cache = init_int4_cache(eng.config, capacity, eng.dtype)
    state = KVState(cache=cache, kv_type="evict", sink=sink,
                    ctx_len=int(len(ctx_ids)), prefill_len=prefill_len,
                    prefill_ids=prefill_ids, ctx_ids=ctx_ids)
    # sync so cache init time is separated from the first chunk
    np.asarray(jax.device_get(state.cache.seen))
    log("cache initialized, starting chunks")

    pos = 0
    i = 0
    while pos < prefill_len:
        n = min(CHUNK, prefill_len - pos)
        t = time.time()
        eng._forward_chunks(prefill_ids[pos:pos + n], state)
        # hard sync (device_get, not block_until_ready — tunnel quirk)
        np.asarray(jax.device_get(state.cache.seen))
        log(f"chunk {i} (+{n} tok, pos {pos + n}/{prefill_len}): "
            f"{time.time() - t:.1f}s")
        pos += n
        i += 1
    log(f"prefill done in {time.time() - t0:.1f}s total")


if __name__ == "__main__":
    main()
