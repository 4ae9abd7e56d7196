"""Measure raw matmul/attention rates at single-stream decode shapes.

Decode attention streams every K/V element through the MXU once; this probe
establishes the achievable rate on one v5e chip for M=28 (q rows) against
R=157696 KV rows (the 7B/131k ratio-0.3 flat cache, one layer), across
dtypes and orientations — pure XLA, no Pallas. All operands are explicit
jit arguments (closure constants blow the remote-compile request limit).

Timing: chain n reps inside one jit via scan (carry folds a full reduction
of the output back into q — no DCE), time n=2 and n=16, report (t16-t2)/14.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/probe_matmul.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

M, D, R = 28, 128, 157696


def log(m):
    print(m, file=sys.stderr, flush=True)


def chained(step):
    """step(q, ops) -> scalar-ish (M, D) update; returns jit(run)(q, ops, n)."""

    def run(q, ops, n):
        def body(q, _):
            return step(q, ops), None
        q, _ = jax.lax.scan(body, q, None, length=n)
        return q

    return jax.jit(run, static_argnames=("n",))


def measure(name, step, q0, ops, bytes_per_rep):
    run = chained(step)
    try:
        jax.device_get(run(q0, ops, 2))
        t0 = time.time()
        jax.device_get(run(q0, ops, 2))
        t2 = time.time() - t0
        jax.device_get(run(q0, ops, 16))
        t0 = time.time()
        jax.device_get(run(q0, ops, 16))
        t16 = time.time() - t0
    except Exception as e:
        log(f"{name:24s} FAILED: {str(e)[:200]}")
        return None
    per = (t16 - t2) / 14
    rate = R / per / 1e9
    log(f"{name:24s} {per * 1e6:9.1f} us/rep  {rate:6.2f} Grows/s  "
        f"{bytes_per_rep / per / 1e9:7.1f} GB/s")
    return per


def main():
    key = jax.random.PRNGKey(0)
    q_bf = jax.random.normal(key, (M, D), jnp.bfloat16)
    k_bf = jax.random.normal(key, (R, D), jnp.bfloat16) * 0.1
    kt_bf = jnp.asarray(np.ascontiguousarray(
        np.asarray(jax.device_get(k_bf)).T))          # (D, R)
    v_bf = jax.random.normal(key, (R, D), jnp.bfloat16) * 0.1

    def consume(q, out):
        # full reduction of out -> no DCE; negligible extra cost
        red = jnp.sum(out, axis=-1, keepdims=True).astype(q.dtype)
        return q * 0.999 + red * 1e-6

    # 1. bf16 NN: q @ KT(D, R)
    measure("bf16 NN q@KT", lambda q, o: consume(q, q @ o[0]),
            q_bf, (kt_bf,), R * D * 2)

    # 2. bf16 NT: contract minor x minor (known Mosaic slow path in Pallas;
    #    does XLA hit it too?)
    measure("bf16 NT q@K'", lambda q, o: consume(
        q, jax.lax.dot_general(q, o[0], (((1,), (1,)), ((), ())))),
        q_bf, (k_bf,), R * D * 2)

    # 3. f32 NT
    measure("f32 NT", lambda q, o: consume(
        q, jax.lax.dot_general(q.astype(jnp.float32), o[0],
                               (((1,), (1,)), ((), ())))),
        q_bf, (k_bf.astype(jnp.float32),), R * D * 4)

    # 4. int8 NN -> int32
    qi = jnp.clip(jnp.round(q_bf.astype(jnp.float32) * 10), -127, 127
                  ).astype(jnp.int8)
    kti = jnp.clip(jnp.round(kt_bf.astype(jnp.float32) * 100), -127, 127
                   ).astype(jnp.int8)
    measure("int8 NN -> int32", lambda q, o: consume(
        q, jax.lax.dot_general(
            jnp.clip(jnp.round(q.astype(jnp.float32) * 10), -127, 127
                     ).astype(jnp.int8), o[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)),
        q_bf, (kti,), R * D)

    # 5. V-side: p(M, R) @ V(R, D)  (p regenerated from q each rep)
    pv = jax.random.normal(key, (M, R), jnp.bfloat16) * 0.01

    def v_step(q, o):
        p, v = o
        p = p * q[0, 0]          # tie to carry, keep shape
        return consume(q, jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ()))))
    measure("bf16 p@V (contract R)", v_step, q_bf, (pv, v_bf), R * D * 2)

    # 6. full attention, pure XLA: NN score + softmax + p@V
    def attn_step(q, o):
        kt, v = o
        s = (q @ kt).astype(jnp.float32) * (D ** -0.5)   # (M, R)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                  (((1,), (0,)), ((), ())))
        return q * 0.999 + out.astype(q.dtype) * 1e-3
    measure("bf16 full attn XLA", attn_step, q_bf, (kt_bf, v_bf),
            R * D * 4)

    # 7. HBM read sanity: full reduction of K (read R*D bf16)
    measure("reduce K", lambda q, o: consume(
        q, jnp.sum(o[0] * q[0, 0], axis=0, keepdims=True)),
        q_bf, (k_bf,), R * D * 2)

    # 8. int8 NN at batch M=128 (how much does bigger M help the MXU?)
    q128 = jax.random.normal(key, (128, D), jnp.bfloat16)
    measure("bf16 NN M=128", lambda q, o: consume(q, q @ o[0]),
            q128, (kt_bf,), R * D * 2)


if __name__ == "__main__":
    main()
