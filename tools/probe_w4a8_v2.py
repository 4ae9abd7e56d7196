"""Chip probe: v1 vs v2 (column-blocked) stacked W4A8 decode chain.

Times the 28-layer x 4-launch 7B linear chain at T=1 for the v1 kernel and
a sweep of v2 (gpb, block-MB) configs. VERDICT r4 weak #1: v1 measured
438-477 GB/s vs the chip's 600-732 GB/s int8 read ceiling because its
grids have 1-2 reduction steps per matrix (no DMA pipelining).

    timeout 1800 python tools/probe_w4a8_v2.py [variant ...]

variants: v1 | v2:<gpb>:<target_mb> | v2d (default policy)
default sweep: v1 v2:8:4 v2:8:2 v2:16:4 v2:16:8
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

from kvzip_tpu.config import resolve_config
from kvzip_tpu.ops.w4a8 import GROUP, _pad_groups, w4a8_linear_stacked
from kvzip_tpu.ops.w4a8_v2 import _pick_hb, w4a8_matmul_stacked_v2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    trim = os.environ.get("TRIM", "1") == "1"

    def w4_stack(IN, OUT):
        Gp, _ = _pad_groups(IN // GROUP)
        half = OUT // 2
        Gp2 = -(-(IN // GROUP) // 8) * 8 if trim else Gp
        rows2 = IN if trim else Gp * GROUP
        return {"q4": jnp.full((L, Gp * GROUP, half), 0x5A, jnp.uint8),
                "s": jnp.full((L, Gp, OUT), 1e-3, jnp.bfloat16),
                "z": jnp.full((L, Gp, OUT), -1e-3, jnp.bfloat16),
                "q4t": jnp.full((L, rows2, half), 0x5A, jnp.uint8),
                "s2": jnp.full((L, 2, Gp2, half), 1e-3, jnp.bfloat16),
                "z2": jnp.full((L, 2, Gp2, half), -1e-3, jnp.bfloat16)}

    shapes = {"wqkv": (D, H * Dh + 2 * Hkv * Dh), "wo": (H * Dh, D),
              "w_gateup": (D, 2 * I), "w_down": (I, D)}
    w4 = {k: w4_stack(*v) for k, v in shapes.items()}
    gb4 = sum(w4[k][a].size * w4[k][a].dtype.itemsize
              for k in w4 for a in ("q4", "s", "z")) / 1e9
    gb4t = sum(w4[k][a].size * w4[k][a].dtype.itemsize
               for k in w4 for a in ("q4t", "s2", "z2")) / 1e9
    log(f"w4a8 linear bytes: v1 {gb4:.2f} GB, v2 {gb4t:.2f} GB")
    for k, (IN, OUT) in shapes.items():
        Gp, _ = _pad_groups(IN // GROUP)
        half = OUT // 2
        for gpb in (8, 16):
            hb = _pick_hb(half, gpb)
            log(f"  {k}: Gp={Gp} half={half} | gpb={gpb} -> hb={hb} "
                f"grid=({-(-half // hb)}x{Gp // gpb}) "
                f"blk={gpb * GROUP * hb / 2**20:.1f}MB")

    def chain_v1(x, _w4):
        def layer(carry, l):
            qkv = w4a8_linear_stacked(
                carry, {k: _w4["wqkv"][k] for k in ("q4", "s", "z")}, l)
            o = w4a8_linear_stacked(
                qkv[:, :H * Dh], {k: _w4["wo"][k] for k in ("q4", "s", "z")}, l)
            gu = w4a8_linear_stacked(
                o, {k: _w4["w_gateup"][k] for k in ("q4", "s", "z")}, l)
            d = w4a8_linear_stacked(
                jax.nn.silu(gu[:, :I]) * gu[:, I:],
                {k: _w4["w_down"][k] for k in ("q4", "s", "z")}, l)
            return d, None
        y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
        return y

    def make_chain_v2(gpb, tmb):
        def lin(x, w, l):
            half = w["q4t"].shape[2]
            hb = _pick_hb(half, gpb, tmb) if tmb else 0
            return w4a8_matmul_stacked_v2(x, w["q4t"], w["s2"], w["z2"], l,
                                          hb=hb, gpb=gpb)

        def chain(x, _w4):
            def layer(carry, l):
                qkv = lin(carry, _w4["wqkv"], l)
                o = lin(qkv[:, :H * Dh], _w4["wo"], l)
                gu = lin(o, _w4["w_gateup"], l)
                d = lin(jax.nn.silu(gu[:, :I]) * gu[:, I:], _w4["w_down"], l)
                return d, None
            y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return y
        return chain

    def make_chain_x2(gpb, tmb):
        """Every launch twice (distinct inputs, no CSE): t(x2) - t(x1) =
        marginal per-byte cost; 2*t(x1) - t(x2) = fixed per-layer cost."""
        def lin(x, w, l):
            half = w["q4t"].shape[2]
            hb = _pick_hb(half, gpb, tmb) if tmb else 0
            return w4a8_matmul_stacked_v2(x, w["q4t"], w["s2"], w["z2"], l,
                                          hb=hb, gpb=gpb)

        def lin2(x, w, l):
            eps = jnp.bfloat16(1e-3)
            return lin(x, w, l) + lin(x + eps, w, l)

        def chain(x, _w4):
            def layer(carry, l):
                qkv = lin2(carry, _w4["wqkv"], l)
                o = lin2(qkv[:, :H * Dh], _w4["wo"], l)
                gu = lin2(o, _w4["w_gateup"], l)
                d = lin2(jax.nn.silu(gu[:, :I]) * gu[:, I:],
                         _w4["w_down"], l)
                return d, None
            y, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return y
        return chain

    def make_chain_kernels_only(gpb, tmb):
        """4 kernel launches per layer, ~zero glue (pre-quantized fixed
        activations, outputs folded by one tiny add each): isolates
        launch+pipeline-fill cost from the inter-launch glue ops."""
        from kvzip_tpu.ops.w4a8_v2 import w4a8_matmul_stacked_v2 as k2

        xq1 = jnp.full((8, D), 3, jnp.int8)
        xq2 = jnp.full((8, I), 3, jnp.int8)
        xs = jnp.full((8, 1), 0.01, jnp.float32)

        def raw(xq, xs, w, l, hb, gpb):
            # call the pallas path directly (bypass quantize/pad glue)
            import functools as ft

            from kvzip_tpu.ops import w4a8_v2 as m
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            L2, INp, half = w["q4t"].shape
            Gp = w["s2"].shape[2]
            nob = -(-half // hb)
            ngb = Gp // gpb
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1, nob, ngb),
                in_specs=[
                    pl.BlockSpec((8, gpb * GROUP),
                                 lambda tb, ob, gb, m_: (tb, gb)),
                    pl.BlockSpec((8, 1), lambda tb, ob, gb, m_: (tb, 0)),
                    pl.BlockSpec((1, gpb * GROUP, hb),
                                 lambda tb, ob, gb, m_: (m_[0], gb, ob)),
                    pl.BlockSpec((1, 1, gpb, hb),
                                 lambda tb, ob, gb, m_: (m_[0], 0, gb, ob)),
                    pl.BlockSpec((1, 1, gpb, hb),
                                 lambda tb, ob, gb, m_: (m_[0], 1, gb, ob)),
                    pl.BlockSpec((1, 1, gpb, hb),
                                 lambda tb, ob, gb, m_: (m_[0], 0, gb, ob)),
                    pl.BlockSpec((1, 1, gpb, hb),
                                 lambda tb, ob, gb, m_: (m_[0], 1, gb, ob)),
                ],
                out_specs=[
                    pl.BlockSpec((8, hb), lambda tb, ob, gb, m_: (tb, ob)),
                    pl.BlockSpec((8, hb), lambda tb, ob, gb, m_: (tb, ob)),
                ],
                scratch_shapes=[pltpu.VMEM((8, hb), jnp.float32),
                                pltpu.VMEM((8, hb), jnp.float32)],
            )
            o_hi, o_lo = pl.pallas_call(
                ft.partial(m._w4a8_v2_kernel, gpb=gpb, dtype=jnp.bfloat16),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((8, half), jnp.bfloat16)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 2 ** 20,
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary")),
            )(jnp.asarray(l, jnp.int32).reshape(1), xq, xs,
              w["q4t"], w["s2"], w["s2"], w["z2"], w["z2"])
            return o_hi

        def chain(x, _w4):
            def layer(c, l):
                acc = c
                for nm, xqv in (("wqkv", xq1), ("wo", xq1),
                                ("w_gateup", xq1), ("w_down", xq2)):
                    half = _w4[nm]["q4t"].shape[2]
                    hb = _pick_hb(half, gpb, tmb) if tmb else 0
                    y = raw(xqv, xs, _w4[nm], l, hb or _pick_hb(half, gpb),
                            gpb)
                    acc = acc + y[:1, :1].astype(x.dtype)
                return acc, None
            c, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return c

        return chain

    variants = sys.argv[1:] or ["v1", "v2:8:4", "v2:8:2", "v2:16:4", "v2:16:8"]
    reps = 16
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, D)),
                    jnp.bfloat16)
    for name in variants:
        if name == "v1":
            fn = chain_v1
        elif name == "v2d":
            fn = make_chain_v2(0, 0)
        elif name.startswith("v2x2"):
            _, gpb, tmb = name.split(":")
            fn = make_chain_x2(int(gpb), float(tmb))
        elif name.startswith("v2k"):
            _, gpb, tmb = name.split(":")
            fn = make_chain_kernels_only(int(gpb), float(tmb))
        else:
            _, gpb, tmb = name.split(":")
            fn = make_chain_v2(int(gpb), float(tmb))
        f = jax.jit(lambda x0, _w, n=reps, fn=fn: jax.lax.fori_loop(
            0, n, lambda i, c: fn(c, _w), x0))
        try:
            t0 = time.time()
            np.asarray(jax.device_get(f(x, w4)))  # compile+run
            tc = time.time() - t0
            t0 = time.time()
            np.asarray(jax.device_get(f(x, w4)))
            dt = (time.time() - t0) / reps
            g = gb4 if name == "v1" else gb4t
            log(f"{name:10s} {dt * 1e3:8.2f} ms per 28-layer chain "
                f"({g / dt:.0f} GB/s weight read)  [compile+1st {tc:.0f}s]")
        except Exception as e:
            log(f"{name:10s} FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
