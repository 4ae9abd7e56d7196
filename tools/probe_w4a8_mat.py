"""Per-matrix chip probe for the v2 stacked W4A8 kernel.

Times each 7B decode matrix shape separately (scan over 28 layers, chained
reps) across (gpb, hb) block configs, against the 664 GB/s int8-read
roofline. Finds which matrix is below roofline and which geometry fixes it.

    timeout 1800 python tools/probe_w4a8_mat.py [name ...]
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
from kvzip_tpu.ops.w4a8 import GROUP, _pad_groups
from kvzip_tpu.ops.w4a8_v2 import w4a8_matmul_stacked_v2


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    cfg = resolve_config("qwen2.5-7b")
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    mats = {
        "wqkv": (D, H * Dh + 2 * Hkv * Dh,
                 [(8, 2304), (16, 2304), (32, 2304), (16, 1152), (8, 1152),
                  (4, 2304), (4, 1152)]),
        "wo": (H * Dh, D, [(8, 1792), (16, 1792), (32, 1792), (4, 1792)]),
        "w_gateup": (D, 2 * I,
                     [(8, 4736), (8, 9472), (16, 4736), (16, 9472),
                      (32, 4736), (8, 6400), (4, 4736), (4, 9472)]),
        "w_down": (I, D, [(8, 1792), (16, 1792), (32, 1792), (40, 1792),
                          (4, 1792)]),
    }
    names = sys.argv[1:] or list(mats)
    reps = 32

    trim = os.environ.get("TRIM", "1") == "1"
    for name in names:
        IN, OUT, cfgs = mats[name]
        if trim:
            Gp = -(-(IN // GROUP) // 8) * 8   # scales padded to 8; bytes exact
            rows = IN
        else:
            Gp, _ = _pad_groups(IN // GROUP)
            rows = Gp * GROUP
        half = OUT // 2
        w = {"q4": jnp.full((L, rows, half), 0x5A, jnp.uint8),
             "s2": jnp.full((L, 2, Gp, half), 1e-3, jnp.bfloat16),
             "z2": jnp.full((L, 2, Gp, half), -1e-3, jnp.bfloat16)}
        gb = sum(a.size * a.dtype.itemsize for a in w.values()) / 1e9
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, IN)),
                        jnp.bfloat16)
        log(f"{name}: {gb * 1e3:.1f} MB/layer-stack, ideal "
            f"{gb / 0.664 * 1e3 / L:.1f} us/layer @664GB/s")
        for gpb, hb in cfgs:
            if Gp % gpb:
                continue

            def chain(x0, _w, gpb=gpb, hb=hb):
                def layer(c, l):
                    y = w4a8_matmul_stacked_v2(
                        c, _w["q4"], _w["s2"], _w["z2"], l, hb=hb, gpb=gpb)
                    return c + y[:, :1] * jnp.bfloat16(1e-6), None
                c, _ = jax.lax.scan(layer, x0, jnp.arange(L, dtype=jnp.int32))
                return c

            f = jax.jit(lambda x0, _w, n=reps, fn=chain: jax.lax.fori_loop(
                0, n, lambda i, c: fn(c, _w), x0))
            try:
                np.asarray(jax.device_get(f(x, w)))
                t0 = time.time()
                np.asarray(jax.device_get(f(x, w)))
                dt = (time.time() - t0) / reps
                nsteps = -(-half // hb) * (Gp // gpb)
                blk = gpb * GROUP * hb / 2 ** 20
                log(f"  gpb={gpb:3d} hb={hb:5d} ({nsteps:2d} steps x "
                    f"{blk:4.1f}MB): {dt * 1e6 / L:7.1f} us/layer "
                    f"= {gb / dt:.0f} GB/s")
            except Exception as e:
                log(f"  gpb={gpb:3d} hb={hb:5d}: FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
