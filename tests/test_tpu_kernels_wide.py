"""On-chip Pallas kernel lane, part 2 (VERDICT r3 item 7).

Widens the round-3 lane (test_tpu_kernels.py, 8 tests) with:

- the POOL decode kernels (`ops/pool_decode.py`) — numerics vs the
  chip-validated flat kernels, including a flagship-like geometry with one
  full-capacity layer (the head-level case the round-3 uniform-r_pad layout
  degenerated on);
- the v3 fused flash/scoring kernels (`ops/flash_int4.py`) — boundary
  masking split + the read-only extras pass;
- the stacked W4A8 linear (scan path with the layer scalar);
- PERF-FLOOR guards: each hot kernel must stay within ~20-25% of the number
  archived in the round-3/4 probe logs at the same shape. Round 3's two
  measured Mosaic traps (bf16 singleton-sublane slow layout on (1, P) scale
  rows; >16-group blocks starving the w4a8 pipeline) were caught by probes,
  not tests — these floors turn them into regressions.

    KVZIP_TPU_TESTS=1 python -m pytest tests/ -n 0 -m tpu -q

Timing through the axon tunnel uses the slope method (chain n reps inside
one jit; (t_n2 - t_n1)/(n2 - n1)) — the only number free of the ~40-60 ms
per-call dispatch cost (NOTES.md probe discipline).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

SCALE = 128 ** -0.5
D = 128

# measured-on-chip baselines (this file's own shapes; see
# bench_results/tpu_kernel_lane_r4.log) with ~20-25% regression headroom.
# KVZIP_TPU_PERF=0 skips only the floors (parity always runs).
PERF_FLOORS = {
    # GB/s of context bytes streamed per kernel invocation
    "flat_decode_int4": 300.0,   # probe_flat_real.py: 396 GB/s
    "pool_decode_int4": 300.0,   # same math, same DMA structure
    "pool_decode_bf16": 300.0,
    # TFLOP/s of attention math
    "flash_int4_prefill": 70.0,  # r3: 93 TF on the heaviest 131k chunk
    "scoring_extras": 52.0,      # r3: 67-69 TF (pre-v3) at block_q 576
    # GB/s of weight bytes read (the w4a8 decode roofline)
    "w4a8_stacked": 300.0,       # probe_w4a8_stacked.py
    "w4a8_v2": 400.0,            # probe_w4a8_mat.py r5: 545 GB/s at gate/up
    # fused activation kernels: ops/s floor (catastrophe guard; the
    # printed fused-vs-XLA ratio is the decision evidence, VERDICT r4 #4)
    "fused_act_norm": 0.05,      # >= 1 op / 20 us
}


def _slope(fn, x, *arrays, n1=4, n2=16):
    """Per-rep seconds via chained-reps slope (tunnel-safe timing).

    The operand ``arrays`` MUST be passed here (fn(o, *arrays)), never
    captured in fn's closure: closure-captured arrays are serialized into
    the remote_compile request body and the axon tunnel rejects multi-MB
    bodies with HTTP 413 (NOTES.md probe discipline).

    Reps chain through a ``fori_loop`` with a DYNAMIC trip count, so both
    timing points share one executable, and callers size (n2 - n1) so the
    kernel signal is tens of ms — the tunnel's per-dispatch jitter is
    multiple ms and a too-small rep count returns noise (the first lane
    run measured a NEGATIVE bandwidth on the 14-us w4a8 step)."""

    @jax.jit
    def reps(x, arrays, n):
        return jax.lax.fori_loop(0, n, lambda i, o: fn(o, *arrays), x)

    def t(n):
        n = jnp.asarray(n, jnp.int32)
        # sync on a tiny slice: full-array device_get of a multi-MB output
        # through the tunnel would swamp the kernel time being measured
        np.asarray(jax.device_get(reps(x, arrays, n).ravel()[:8]))
        t0 = time.time()
        np.asarray(jax.device_get(reps(x, arrays, n).ravel()[:8]))
        return time.time() - t0

    t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def _perf_enabled():
    return os.environ.get("KVZIP_TPU_PERF", "1") == "1"


def _check_floor(name, value, unit):
    print(f"[perf] {name}: {value:.1f} {unit} "
          f"(floor {PERF_FLOORS[name]:.0f})", flush=True)
    if _perf_enabled():
        assert value >= PERF_FLOORS[name], (
            f"{name} regressed: {value:.1f} {unit} < floor "
            f"{PERF_FLOORS[name]} (archived probe logs in bench_results/)")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


# --------------------------------------------------------------- pool parity
def _mk_pool_int4(rng, rows_per_layer, Hkv, align, Tcap, dtype=jnp.bfloat16):
    from kvzip_tpu.ops.quant import quantize_int4

    r_pad = [max(align, -(-r // align) * align) for r in rows_per_layer]
    off = np.concatenate([[0], np.cumsum(r_pad)[:-1]]).astype(np.int32)
    alloc = int(off[-1] + max(r_pad))

    kq_pool = np.zeros((D // 2, alloc), np.uint8)
    vq_pool = np.zeros((D // 2, alloc), np.uint8)
    sz = {n: np.zeros((alloc,), np.float32)
          for n in ("ks", "kz", "vs", "vz")}
    rh = np.full((alloc,), -1, np.int32)
    per_layer = []
    for l, r in enumerate(rows_per_layer):
        k = rng.standard_normal((r, D)).astype(np.float32)
        v = rng.standard_normal((r, D)).astype(np.float32)
        h = np.sort(rng.integers(0, Hkv, size=r)).astype(np.int32)
        kq, ks, kz = quantize_int4(jnp.asarray(k), pack="split")
        vq, vs, vz = quantize_int4(jnp.asarray(v), pack="split")
        o = int(off[l])
        kq_pool[:, o:o + r] = np.asarray(kq).T
        vq_pool[:, o:o + r] = np.asarray(vq).T
        sz["ks"][o:o + r] = np.asarray(ks)[:, 0]
        sz["kz"][o:o + r] = np.asarray(kz)[:, 0]
        sz["vs"][o:o + r] = np.asarray(vs)[:, 0]
        sz["vz"][o:o + r] = np.asarray(vz)[:, 0]
        rh[o:o + r] = h
        per_layer.append(((kq, ks, kz), (vq, vs, vz), h))
    pool = dict(
        k_pool_q=jnp.asarray(kq_pool), v_pool_q=jnp.asarray(vq_pool),
        k_pool_s=jnp.asarray(sz["ks"])[None],
        k_pool_z=jnp.asarray(sz["kz"])[None],
        v_pool_s=jnp.asarray(sz["vs"])[None],
        v_pool_z=jnp.asarray(sz["vz"])[None],
        row_head=jnp.asarray(rh)[None],
        layer_off=jnp.asarray(off),
        layer_rows=jnp.asarray(rows_per_layer, jnp.int32))
    return pool, dict(align=align, max_rows=max(r_pad)), per_layer


@pytest.mark.parametrize("layer", [0, 1, 3])
def test_pool_int4_chip_matches_flat(rng, layer):
    """Pool int4 decode COMPILED on chip == the chip-validated flat kernel
    fed that layer's rows alone (uneven per-layer spread)."""
    from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4
    from kvzip_tpu.ops.pool_decode import pool_decode_attend_int4

    Hkv, G, T = 2, 2, 1
    H = Hkv * G
    align, Tcap, tail_used = 512, 128, 3
    rows = [1500, 512, 890, 2048]

    pool, meta, per_layer = _mk_pool_int4(rng, rows, Hkv, align, Tcap)
    k_tail = jnp.asarray(
        rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(
        rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    got = pool_decode_attend_int4(
        q, pool["k_pool_q"], pool["k_pool_s"], pool["k_pool_z"],
        pool["v_pool_q"], pool["v_pool_s"], pool["v_pool_z"],
        pool["row_head"], pool["layer_off"], pool["layer_rows"],
        k_tail, v_tail, jnp.asarray(tail_used, jnp.int32),
        jnp.asarray(layer, jnp.int32), scale=SCALE, align=meta["align"],
        max_rows=meta["max_rows"], block=512)

    (kq, ks, kz), (vq, vs, vz), heads = per_layer[layer]
    r = rows[layer]
    r_pad = -(-r // 512) * 512

    def pad_t(a):
        return jnp.pad(jnp.asarray(a).T, ((0, 0), (0, r_pad - r)))

    def pad_s(a):
        return jnp.pad(jnp.asarray(a)[:, 0].astype(jnp.float32),
                       ((0, r_pad - r),))

    rh_l = np.full((r_pad,), -1, np.int32)
    rh_l[:r] = heads
    want = flat_decode_attend_int4(
        q, pad_t(kq), pad_s(ks), pad_s(kz), pad_t(vq), pad_s(vs), pad_s(vz),
        jnp.asarray(rh_l), k_tail, v_tail,
        jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=512)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=3e-2)


def test_pool_int4_chip_q8(rng):
    """int8-attention pool mode on chip stays close to the exact path."""
    from kvzip_tpu.ops.pool_decode import pool_decode_attend_int4

    Hkv, G, T = 2, 2, 1
    H = Hkv * G
    align, Tcap, tail_used = 512, 128, 2
    rows = [1500, 700]
    pool, meta, _ = _mk_pool_int4(rng, rows, Hkv, align, Tcap)
    k_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    args = (q, pool["k_pool_q"], pool["k_pool_s"], pool["k_pool_z"],
            pool["v_pool_q"], pool["v_pool_s"], pool["v_pool_z"],
            pool["row_head"], pool["layer_off"], pool["layer_rows"],
            k_tail, v_tail, jnp.asarray(tail_used, jnp.int32),
            jnp.asarray(0, jnp.int32))
    kw = dict(scale=SCALE, align=meta["align"], max_rows=meta["max_rows"],
              block=512)
    exact = pool_decode_attend_int4(*args, **kw)
    got = pool_decode_attend_int4(*args, q8=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(exact, np.float32),
        rtol=0, atol=8e-2)


def test_pool_bf16_chip_matches_flat(rng):
    from kvzip_tpu.ops.flat_decode import flat_decode_attend
    from kvzip_tpu.ops.pool_decode import pool_decode_attend

    Hkv, G, T = 2, 2, 1
    H = Hkv * G
    align, Tcap, tail_used = 512, 128, 2
    rows = [1400, 600]
    r_pad = [max(align, -(-r // align) * align) for r in rows]
    off = np.concatenate([[0], np.cumsum(r_pad)[:-1]]).astype(np.int32)
    alloc = int(off[-1] + max(r_pad))

    k_pool = np.zeros((D, alloc), np.float32)
    v_pool = np.zeros((alloc, D), np.float32)
    rh = np.full((alloc,), -1, np.int32)
    layers = []
    for l, r in enumerate(rows):
        k = rng.standard_normal((r, D)).astype(np.float32)
        v = rng.standard_normal((r, D)).astype(np.float32)
        h = np.sort(rng.integers(0, Hkv, size=r)).astype(np.int32)
        o = int(off[l])
        k_pool[:, o:o + r] = k.T
        v_pool[o:o + r] = v
        rh[o:o + r] = h
        layers.append((k, v, h))
    k_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    for layer in range(2):
        got = pool_decode_attend(
            q, jnp.asarray(k_pool, jnp.bfloat16),
            jnp.asarray(v_pool, jnp.bfloat16), jnp.asarray(rh)[None],
            jnp.asarray(off), jnp.asarray(rows, jnp.int32),
            k_tail, v_tail, jnp.asarray(tail_used, jnp.int32),
            jnp.asarray(layer, jnp.int32), scale=SCALE, align=align,
            max_rows=max(r_pad), block=512)
        k, v, h = layers[layer]
        r = rows[layer]
        rp = -(-r // 512) * 512
        rh_l = np.full((rp,), -1, np.int32)
        rh_l[:r] = h
        want = flat_decode_attend(
            q, jnp.asarray(np.pad(k.T, ((0, 0), (0, rp - r))), jnp.bfloat16),
            jnp.asarray(np.pad(v, ((0, rp - r), (0, 0))), jnp.bfloat16),
            jnp.asarray(rh_l), k_tail, v_tail,
            jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=512)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=3e-2, err_msg=f"layer {layer}")


def test_pool_int4_chip_headlevel_geometry(rng):
    """Head-level geometry: one layer keeps EVERYTHING, another nearly
    nothing — the spread that broke the round-3 uniform-r_pad flat layout.
    Numerics vs the flat kernel per layer at 7B-like head counts."""
    from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4
    from kvzip_tpu.ops.pool_decode import pool_decode_attend_int4

    Hkv, G, T = 4, 7, 1
    H = Hkv * G
    align, Tcap, tail_used = 512, 128, 1
    rows = [8192, 512, 2048]  # full / almost-empty / partial

    pool, meta, per_layer = _mk_pool_int4(rng, rows, Hkv, align, Tcap)
    k_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(rng.standard_normal((Hkv, Tcap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    for layer in range(3):
        got = pool_decode_attend_int4(
            q, pool["k_pool_q"], pool["k_pool_s"], pool["k_pool_z"],
            pool["v_pool_q"], pool["v_pool_s"], pool["v_pool_z"],
            pool["row_head"], pool["layer_off"], pool["layer_rows"],
            k_tail, v_tail, jnp.asarray(tail_used, jnp.int32),
            jnp.asarray(layer, jnp.int32), scale=SCALE, align=meta["align"],
            max_rows=meta["max_rows"], block=512)
        (kq, ks, kz), (vq, vs, vz), heads = per_layer[layer]
        r = rows[layer]
        r_pad = -(-r // 512) * 512
        rh_l = np.full((r_pad,), -1, np.int32)
        rh_l[:r] = heads
        want = flat_decode_attend_int4(
            q, jnp.pad(jnp.asarray(kq).T, ((0, 0), (0, r_pad - r))),
            jnp.pad(jnp.asarray(ks)[:, 0].astype(jnp.float32),
                    ((0, r_pad - r),)),
            jnp.pad(jnp.asarray(kz)[:, 0].astype(jnp.float32),
                    ((0, r_pad - r),)),
            jnp.pad(jnp.asarray(vq).T, ((0, 0), (0, r_pad - r))),
            jnp.pad(jnp.asarray(vs)[:, 0].astype(jnp.float32),
                    ((0, r_pad - r),)),
            jnp.pad(jnp.asarray(vz)[:, 0].astype(jnp.float32),
                    ((0, r_pad - r),)),
            jnp.asarray(rh_l), k_tail, v_tail,
            jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=512)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=3e-2, err_msg=f"layer {layer}")


# ------------------------------------------------------ v3 kernels (parity)
def test_flash_int4_v3_boundary_mask(rng):
    """v3 splits the KV sweep into unmasked interior + masked boundary
    blocks; exercise a base length that is NOT a block multiple so both
    loops run and the split point is non-trivial."""
    from kvzip_tpu.ops.attention import attend_blockwise_int4
    from kvzip_tpu.ops.flash_int4 import flash_attend_int4
    from kvzip_tpu.ops.quant import quantize_int4

    Hkv, G, C, T = 2, 2, 2048, 256
    H = Hkv * G
    base = 1000  # not a multiple of block_k
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    lens = jnp.asarray([base, base - 130], jnp.int32)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    got = flash_attend_int4(
        q, jnp.swapaxes(kq, 1, 2), ks[..., 0], kz[..., 0],
        jnp.swapaxes(vq, 1, 2), vs[..., 0], vz[..., 0], lens,
        jnp.asarray(base, jnp.int32), scale=SCALE, block_q=128, block_k=256)
    want = attend_blockwise_int4(q, kq, ks, kz, vq, vs, vz, lens, None,
                                 scale=SCALE)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=5e-2)


def test_scoring_extras_chip(rng):
    """Read-only scoring attention (cache stream + VMEM extras) on chip ==
    append-then-flash (the exact-semantics identity the engine relies on)."""
    from kvzip_tpu.ops.flash_int4 import (flash_attend_int4,
                                          flash_attend_int4_extra)
    from kvzip_tpu.ops.quant import quantize_int4

    Hkv, G, C, T = 2, 2, 2048, 512
    H = Hkv * G
    base = 1536
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Hkv, C + T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Hkv, C + T, D)), jnp.bfloat16)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    lens = jnp.asarray([base, base], jnp.int32)

    # extras: the chunk's own K/V rows quantized per row, (T, Hkv, ...)
    kx = k[:, base:base + T].transpose(1, 0, 2)
    vx = v[:, base:base + T].transpose(1, 0, 2)
    kxq, kxs, kxz = quantize_int4(kx, pack="split")
    vxq, vxs, vxz = quantize_int4(vx, pack="split")

    got = flash_attend_int4_extra(
        q, jnp.swapaxes(kq[:, :C], 1, 2), ks[:, :C, 0], kz[:, :C, 0],
        jnp.swapaxes(vq[:, :C], 1, 2), vs[:, :C, 0], vz[:, :C, 0], lens,
        kxq, kxs, kxz, vxq, vxs, vxz, scale=SCALE)

    # reference: dense cache with those exact quantized rows appended
    def splice(cache_q, cache_s, cache_z, x_q, x_s, x_z):
        qq = cache_q.at[:, base:base + T].set(jnp.swapaxes(x_q, 0, 1))
        ss = cache_s.at[:, base:base + T].set(jnp.swapaxes(x_s, 0, 1))
        zz = cache_z.at[:, base:base + T].set(jnp.swapaxes(x_z, 0, 1))
        return qq, ss, zz

    kq2, ks2, kz2 = splice(kq, ks, kz, kxq, kxs, kxz)
    vq2, vs2, vz2 = splice(vq, vs, vz, vxq, vxs, vxz)
    want = flash_attend_int4(
        q, jnp.swapaxes(kq2, 1, 2), ks2[..., 0], kz2[..., 0],
        jnp.swapaxes(vq2, 1, 2), vs2[..., 0], vz2[..., 0], lens,
        jnp.asarray(base, jnp.int32), scale=SCALE)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=5e-2)


def test_w4a8_stacked_chip(rng):
    """Stacked W4A8 linear (lax.scan weight stacks + layer scalar select)
    vs per-layer dequantized matmul."""
    from kvzip_tpu.ops.w4a8 import (dequantize_weight_int4,
                                    quantize_weight_int4,
                                    w4a8_matmul_stacked)

    L, K, N = 4, 512, 1024
    ws = [jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.float32)
          for _ in range(L)]
    wqs = [quantize_weight_int4(w) for w in ws]
    q4 = jnp.stack([w["q4"] for w in wqs])
    s = jnp.stack([w["s"] for w in wqs])
    z = jnp.stack([w["z"] for w in wqs])
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    for layer in (0, 3):
        got = w4a8_matmul_stacked(x, q4, s, z, jnp.asarray(layer, jnp.int32))
        want = (x.astype(jnp.float32) @ dequantize_weight_int4(
            wqs[layer], jnp.float32)).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=0.1, err_msg=f"layer {layer}")


def test_fused_act_chip(rng):
    """Fused RMSNorm-quant / SiLU-mul-quant kernels COMPILED on chip ==
    their interpret-mode (jnp) execution, at 7B decode shapes."""
    from kvzip_tpu.ops.fused_act import rmsnorm_quant, silu_mul_quant

    T, D, F = 16, 3584, 18944
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D,)) * 0.5, jnp.bfloat16)
    q, s = rmsnorm_quant(x, w, 1e-6)
    qi, si = rmsnorm_quant(x, w, 1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(si), rtol=2e-6)
    assert np.abs(np.asarray(q, np.int32) -
                  np.asarray(qi, np.int32)).max() <= 1

    g = jnp.asarray(rng.standard_normal((T, F)), jnp.bfloat16)
    u = jnp.asarray(rng.standard_normal((T, F)), jnp.bfloat16)
    q2, s2 = silu_mul_quant(g, u)
    q2i, s2i = silu_mul_quant(g, u, interpret=True)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2i), rtol=2e-6)
    assert np.abs(np.asarray(q2, np.int32) -
                  np.asarray(q2i, np.int32)).max() <= 1


# ------------------------------------------------------------- perf floors
def test_perf_flat_decode_int4(rng):
    from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4

    Hkv, G = 4, 7
    H = Hkv * G
    R, TAIL = 786432, 320
    key = jax.random.PRNGKey(0)
    rh = jnp.asarray(np.repeat(np.arange(Hkv, dtype=np.int32), R // Hkv))
    kq = jax.random.randint(key, (D // 2, R), 0, 255, jnp.uint8)
    vq = jax.random.randint(key, (D // 2, R), 0, 255, jnp.uint8)
    s = jnp.full((R,), 0.01, jnp.float32)
    z = jnp.full((R,), -0.05, jnp.float32)
    kt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    vt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    q = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    gb = R * (D + 16) / 1e9

    sec = _slope(
        lambda o, kq, s, z, vq, rh, kt, vt: flat_decode_attend_int4(
            o, kq, s, z, vq, s, z, rh, kt, vt, jnp.asarray(3, jnp.int32),
            scale=SCALE),
        q, kq, s, z, vq, rh, kt, vt, n1=16, n2=216)  # ~250 us/rep
    _check_floor("flat_decode_int4", gb / sec, "GB/s")


def test_perf_pool_decode_int4(rng):
    """Pool kernel at a flagship-like single-layer footprint must stream at
    flat-kernel bandwidth (the whole point of the layout: head-level decode
    reads only live rows at full speed; r3's fallback ran at ~60 GB/s)."""
    from kvzip_tpu.ops.pool_decode import pool_decode_attend_int4

    Hkv, G, L = 4, 7, 4
    H = Hkv * G
    R_layer, TAIL = 786432, 320
    align = 32768
    key = jax.random.PRNGKey(1)
    off = jnp.arange(L, dtype=jnp.int32) * R_layer
    rows = jnp.full((L,), R_layer, jnp.int32)
    P = L * R_layer
    rh = jnp.asarray(np.tile(np.repeat(np.arange(Hkv, dtype=np.int32),
                                       R_layer // Hkv), L))[None]
    kq = jax.random.randint(key, (D // 2, P), 0, 255, jnp.uint8)
    vq = jax.random.randint(key, (D // 2, P), 0, 255, jnp.uint8)
    s = jnp.full((1, P), 0.01, jnp.float32)
    z = jnp.full((1, P), -0.05, jnp.float32)
    kt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    vt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    q = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    gb = R_layer * (D + 16) / 1e9  # per call: ONE layer's live rows

    sec = _slope(
        lambda o, kq, s, z, vq, rh, off, rows, kt, vt:
        pool_decode_attend_int4(
            o, kq, s, z, vq, s, z, rh, off, rows, kt, vt,
            jnp.asarray(3, jnp.int32), jnp.asarray(1, jnp.int32),
            scale=SCALE, align=align, max_rows=R_layer),
        q, kq, s, z, vq, rh, off, rows, kt, vt, n1=16, n2=216)
    _check_floor("pool_decode_int4", gb / sec, "GB/s")


def test_perf_pool_decode_bf16(rng):
    from kvzip_tpu.ops.pool_decode import pool_decode_attend

    Hkv, G, L = 4, 7, 2
    H = Hkv * G
    R_layer, TAIL = 262144, 320
    align = 32768
    key = jax.random.PRNGKey(2)
    off = jnp.arange(L, dtype=jnp.int32) * R_layer
    rows = jnp.full((L,), R_layer, jnp.int32)
    P = L * R_layer
    rh = jnp.asarray(np.tile(np.repeat(np.arange(Hkv, dtype=np.int32),
                                       R_layer // Hkv), L))[None]
    kp = jax.random.normal(key, (D, P), jnp.bfloat16)
    vp = jax.random.normal(key, (P, D), jnp.bfloat16)
    kt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    vt = jnp.zeros((Hkv, TAIL, D), jnp.bfloat16)
    q = jax.random.normal(key, (1, H, D), jnp.bfloat16)
    gb = R_layer * (2 * D * 2) / 1e9

    sec = _slope(
        lambda o, kp, vp, rh, off, rows, kt, vt: pool_decode_attend(
            o, kp, vp, rh, off, rows, kt, vt, jnp.asarray(3, jnp.int32),
            jnp.asarray(0, jnp.int32), scale=SCALE, align=align,
            max_rows=R_layer),
        q, kp, vp, rh, off, rows, kt, vt, n1=32, n2=352)  # ~165 us/rep
    _check_floor("pool_decode_bf16", gb / sec, "GB/s")


def test_perf_flash_int4_prefill(rng):
    """Causal int4 flash prefill TFLOP/s at a mid-context chunk shape."""
    from kvzip_tpu.ops.flash_int4 import flash_attend_int4
    from kvzip_tpu.ops.quant import quantize_int4

    Hkv, G, C, T = 4, 7, 65536, 8192
    H = Hkv * G
    base = C - T
    key = jax.random.PRNGKey(3)
    k = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    v = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    ks0, kz0, vs0, vz0 = ks[..., 0], kz[..., 0], vs[..., 0], vz[..., 0]
    lens = jnp.full((Hkv,), base, jnp.int32)
    q = jax.random.normal(key, (T, H, D), jnp.bfloat16)
    # 2 matmuls (QK^T, PV) x 2 flops, average causal visibility
    flops = 2 * 2 * H * T * (base + T / 2) * D

    sec = _slope(
        lambda o, kqt, ks0, kz0, vqt, vs0, vz0, lens: flash_attend_int4(
            o, kqt, ks0, kz0, vqt, vs0, vz0, lens,
            jnp.asarray(base, jnp.int32), scale=SCALE),
        q, kqt, ks0, kz0, vqt, vs0, vz0, lens, n1=2, n2=6)
    _check_floor("flash_int4_prefill", flops / sec / 1e12, "TFLOP/s")


def test_perf_scoring_extras(rng):
    """Scoring-pass attention (the 2.0x-of-prefill wall-clock hot spot,
    VERDICT r3 weak 3) at repeat-chunk shape."""
    from kvzip_tpu.ops.flash_int4 import flash_attend_int4_extra
    from kvzip_tpu.ops.quant import quantize_int4

    Hkv, G, C, T = 4, 7, 65536, 4608
    H = Hkv * G
    base = C
    key = jax.random.PRNGKey(4)
    k = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    v = jax.random.normal(key, (Hkv, C, D), jnp.bfloat16)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    kqt, vqt = jnp.swapaxes(kq, 1, 2), jnp.swapaxes(vq, 1, 2)
    lens = jnp.full((Hkv,), base, jnp.int32)
    kx = jax.random.normal(key, (T, Hkv, D), jnp.bfloat16)
    vx = jax.random.normal(key, (T, Hkv, D), jnp.bfloat16)
    kxq, kxs, kxz = quantize_int4(kx, pack="split")
    vxq, vxs, vxz = quantize_int4(vx, pack="split")
    q = jax.random.normal(key, (T, H, D), jnp.bfloat16)
    flops = 2 * 2 * H * T * (base + T / 2) * D

    extras = (kxq, kxs, kxz, vxq, vxs, vxz)
    sec = _slope(
        lambda o, kqt, ks0, kz0, vqt, vs0, vz0, lens, *ex:
        flash_attend_int4_extra(
            o, kqt, ks0, kz0, vqt, vs0, vz0, lens, *ex, scale=SCALE),
        q, kqt, ks[..., 0], kz[..., 0], vqt, vs[..., 0], vz[..., 0], lens,
        *extras, n1=2, n2=6)
    _check_floor("scoring_extras", flops / sec / 1e12, "TFLOP/s")


def test_perf_w4a8_stacked(rng):
    """W4A8 stacked decode linear at the 7B qkv shape; guards the
    >16-group block-size Mosaic trap (groups-per-block capped so blocks
    pipeline instead of starving the DMA)."""
    from kvzip_tpu.ops.w4a8 import quantize_weight_int4, w4a8_matmul_stacked

    L, K, N = 28, 3584, 4608
    key = jax.random.PRNGKey(5)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    wq = quantize_weight_int4(w)
    q4 = jnp.broadcast_to(wq["q4"], (L,) + wq["q4"].shape)
    s = jnp.broadcast_to(wq["s"], (L,) + wq["s"].shape)
    z = jnp.broadcast_to(wq["z"], (L,) + wq["z"].shape)
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    gb = (q4[0].size + s[0].size * 2 + z[0].size * 2) / 1e9

    sec = _slope(
        lambda o, q4, s, z: w4a8_matmul_stacked(
            o, q4, s, z, jnp.asarray(7, jnp.int32)).astype(o.dtype)[:, :K],
        x, q4, s, z, n1=512, n2=4608)  # ~14 us/rep -> ~57 ms signal
    _check_floor("w4a8_stacked", gb / sec, "GB/s")


# ---------------------------------------------------------- round-5 kernels
def test_w4a8_v2_chip(rng):
    """Column-blocked v2 stacked kernel COMPILED on chip vs its jnp
    reference, including trimmed byte storage (scales padded to 8, edge
    byte/activation blocks) at a non-multiple-of-8 group count."""
    from kvzip_tpu.ops.w4a8 import quantize_weight_int4
    from kvzip_tpu.ops.w4a8_v2 import (repack_scales_v2,
                                       w4a8_jnp_v2, w4a8_matmul_stacked_v2)

    L, K, N = 3, 1664, 1024          # 13 groups -> Gp8 = 16, edge blocks
    w = jnp.asarray(rng.standard_normal((L, K, N)) * 0.05, jnp.float32)
    w2 = repack_scales_v2(quantize_weight_int4(w), in_dim=K)
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    for layer in (0, 2):
        got = np.asarray(w4a8_matmul_stacked_v2(
            x, w2["q4"], w2["s2"], w2["z2"], jnp.int32(layer)), np.float32)
        wl = {k: v[layer] for k, v in w2.items()}
        want = np.asarray(w4a8_jnp_v2(x, wl), np.float32)
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 2e-2, layer


def test_megakernel_chip(rng):
    """Per-layer fused decode megakernel COMPILED on chip vs the composed
    per-launch path (same bf16 rounding points)."""
    from kvzip_tpu.ops.w4a8 import quantize_weight_int4
    from kvzip_tpu.ops.w4a8_v2 import repack_scales_v2, w4a8_jnp_v2
    from kvzip_tpu.ops.w4a8_fused import w4a8_layer_fused

    L, D2, I2 = 2, 256, 384
    H2, Dh2 = 2, 128
    qdim = H2 * Dh2 + 2 * Dh2

    def quant(IN, OUT, seed):
        w = jnp.asarray(
            np.random.default_rng(seed).standard_normal((L, IN, OUT))
            * 0.05, jnp.float32)
        return repack_scales_v2(quantize_weight_int4(w), in_dim=IN)

    wo, wgu = quant(H2 * Dh2, D2, 1), quant(D2, 2 * I2, 2)
    wdn, wqkv = quant(I2, D2, 3), quant(D2, qdim, 4)
    lnm = jnp.asarray(rng.standard_normal((L, D2)) * 0.1 + 1, jnp.bfloat16)
    lna = jnp.asarray(rng.standard_normal((L, D2)) * 0.1 + 1, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, D2)) * 0.3, jnp.bfloat16)
    attn = jnp.asarray(rng.standard_normal((1, H2 * Dh2)) * 0.3,
                       jnp.bfloat16)

    def rms(v, w):
        vf = v.astype(jnp.float32)
        var = jnp.mean(vf * vf, axis=-1, keepdims=True)
        return (vf * jax.lax.rsqrt(var + 1e-6)
                * w.astype(jnp.float32)).astype(v.dtype)

    for layer in (0, L - 1):
        sl = lambda w: {k: v[layer] for k, v in w.items()}
        o = w4a8_jnp_v2(attn, sl(wo))
        x1 = x + o
        gu = w4a8_jnp_v2(rms(x1, lnm[layer]), sl(wgu))
        x2 = x1 + w4a8_jnp_v2(
            jax.nn.silu(gu[:, :I2]) * gu[:, I2:], sl(wdn))
        nxt = min(layer + 1, L - 1)
        qkv_ref = w4a8_jnp_v2(rms(x2, lna[nxt]), sl(wqkv))

        x_got, qkv_got = w4a8_layer_fused(
            x, attn, lnm[:, None, :], lna[:, None, :], wo, wgu, wdn, wqkv,
            jnp.int32(layer), eps=1e-6)
        for got, ref in ((x_got, x2), (qkv_got, qkv_ref)):
            g, r = np.asarray(got, np.float32), np.asarray(ref, np.float32)
            scale = np.abs(r).max() + 1e-6
            assert np.abs(g - r).max() / scale < 3e-2, layer


def test_windowed_attend_chip(rng):
    """Fused windowed scoring-attention COMPILED on chip vs the jnp
    reference path at a multi-window production-like shape."""
    from kvzip_tpu.ops.attention import windowed_scoring_attend
    from kvzip_tpu.ops.windowed_attend import windowed_scoring_attend_fused

    T, Hkv, G = 256, 4, 7
    H = Hkv * G
    sink, S_ctx = 160, 256

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)

    q = mk(T, H, D)
    ks, kc, kr = mk(Hkv, sink, D), mk(Hkv, S_ctx, D), mk(T, Hkv, D)
    vs, vc, vr = mk(Hkv, sink, D), mk(Hkv, S_ctx, D), mk(T, Hkv, D)
    cl = jnp.asarray(200, jnp.int32)  # partial window (the common case)
    ref = np.asarray(windowed_scoring_attend(
        q, ks, kc, kr, vs, vc, vr, cl, scale=SCALE), np.float32)
    got = np.asarray(windowed_scoring_attend_fused(
        q, ks, kc, kr, vs, vc, vr, cl, scale=SCALE), np.float32)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-2


def test_perf_w4a8_v2(rng):
    """v2 column-blocked stacked linear at the 7B gate/up shape (the
    dominant decode weight read)."""
    from kvzip_tpu.ops.w4a8 import quantize_weight_int4
    from kvzip_tpu.ops.w4a8_v2 import repack_scales_v2, w4a8_matmul_stacked_v2

    L, K, N = 4, 3584, 37888
    key = jax.random.PRNGKey(6)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    w2 = repack_scales_v2(quantize_weight_int4(w[None]), in_dim=K)
    q4 = jnp.broadcast_to(w2["q4"], (L,) + w2["q4"].shape[1:])
    s2 = jnp.broadcast_to(w2["s2"], (L,) + w2["s2"].shape[1:])
    z2 = jnp.broadcast_to(w2["z2"], (L,) + w2["z2"].shape[1:])
    x = jax.random.normal(key, (8, K), jnp.bfloat16)
    gb = (q4[0].size + 2 * s2[0].size * 2) / 1e9

    sec = _slope(
        lambda o, q4, s2, z2: w4a8_matmul_stacked_v2(
            o, q4, s2, z2, jnp.asarray(1, jnp.int32)).astype(o.dtype)[:, :K],
        x, q4, s2, z2, n1=64, n2=384)  # ~150 us/rep -> ~48 ms signal
    _check_floor("w4a8_v2", gb / sec, "GB/s")


def test_perf_fused_act(rng):
    """Fused W8A8 activation kernels vs the composed XLA path at the 7B
    decode shape — the measured comparison VERDICT r4 item 4 asked for.
    Floor guards the fused kernels only; the printed ratio decides the
    engine default (act_fused)."""
    from kvzip_tpu.models.transformer import rms_norm
    from kvzip_tpu.ops.fused_act import rmsnorm_quant, silu_mul_quant
    from kvzip_tpu.ops.quant import quantize_act_int8

    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (8, 3584), jnp.bfloat16)
    w = jax.random.normal(key, (3584,), jnp.bfloat16) * 0.5
    g = jax.random.normal(key, (8, 18944), jnp.bfloat16)
    u = jax.random.normal(key, (8, 18944), jnp.bfloat16)

    sec_f = _slope(
        lambda o, w: rmsnorm_quant(o, w, 1e-6)[0].astype(o.dtype)[:, :3584]
        * jnp.bfloat16(1e-6) + o,
        x, w, n1=512, n2=4096)
    sec_x = _slope(
        lambda o, w: quantize_act_int8(
            rms_norm(o, w, 1e-6))[0].astype(o.dtype)[:, :3584]
        * jnp.bfloat16(1e-6) + o,
        x, w, n1=512, n2=4096)
    sec_fs = _slope(
        lambda o, u: silu_mul_quant(o, u)[0].astype(o.dtype)
        * jnp.bfloat16(1e-6) + o,
        g, u, n1=256, n2=2048)
    sec_xs = _slope(
        lambda o, u: quantize_act_int8(
            jax.nn.silu(o) * u)[0].astype(o.dtype)
        * jnp.bfloat16(1e-6) + o,
        g, u, n1=256, n2=2048)
    print(f"[perf] fused_act: rmsnorm_quant {sec_f * 1e6:.2f} us vs XLA "
          f"{sec_x * 1e6:.2f} us ({sec_x / sec_f:.2f}x); silu_mul_quant "
          f"{sec_fs * 1e6:.2f} us vs XLA {sec_xs * 1e6:.2f} us "
          f"({sec_xs / sec_fs:.2f}x)", flush=True)
    _check_floor("fused_act_norm", 1e-6 / sec_f, "Mops/s")
