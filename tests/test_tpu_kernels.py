"""On-chip Pallas kernel lane (VERDICT r1 item 10).

Runs each kernel COMPILED AND EXECUTED on the real TPU with parity-vs-jnp at
small-but-TPU-legal shapes, so kernel edits can't silently break Mosaic.
CPU CI covers the same parity through ``interpret=True``; this lane catches
what interpret cannot (tiling, DMA alignment, VMEM budgets, dtype lowering).

    KVZIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(Plain CI skips these; the lane skips everything else. Don't run two TPU
processes at once.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

Hkv, G, D = 2, 2, 128
H = Hkv * G
C = 1024
SCALE = D ** -0.5


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _dense_ref(q, k, v, lens, q_pos0=0):
    from kvzip_tpu.ops.attention import attend_dense
    return attend_dense(q, k, v, lens, None, scale=SCALE,
                        q_pos0=jnp.asarray(q_pos0, jnp.int32))


def test_flash_bf16(rng):
    from kvzip_tpu.ops.flash import flash_attend
    T, base = 256, 512
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    lens = jnp.asarray([base, base - 128], jnp.int32)
    got = flash_attend(q, k, v, lens, jnp.asarray(base, jnp.int32),
                       scale=SCALE)
    want = _dense_ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=3e-2)


def test_flash_int4(rng):
    from kvzip_tpu.ops.attention import attend_blockwise_int4
    from kvzip_tpu.ops.flash_int4 import flash_attend_int4
    from kvzip_tpu.ops.quant import quantize_int4
    T, base = 256, 512
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    lens = jnp.asarray([base, base - 128], jnp.int32)
    kq, ks, kz = quantize_int4(k, pack="split")
    vq, vs, vz = quantize_int4(v, pack="split")
    got = flash_attend_int4(
        q, jnp.swapaxes(kq, 1, 2), ks[..., 0], kz[..., 0],
        jnp.swapaxes(vq, 1, 2), vs[..., 0], vz[..., 0], lens,
        jnp.asarray(base, jnp.int32), scale=SCALE)
    want = attend_blockwise_int4(q, kq, ks, kz, vq, vs, vz, lens, None,
                                 scale=SCALE)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=5e-2)


def test_ragged_decode(rng):
    from kvzip_tpu.ops.ragged_decode import ragged_decode_attend
    T = 1
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.bfloat16)
    lens = jnp.asarray([700, 300], jnp.int32)
    got = ragged_decode_attend(q, k, v, lens, scale=SCALE)
    want = _dense_ref(q, k, v, lens)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=3e-2)


def _flat_inputs(rng, R_pad=2048):
    lens = [900, 400]
    k_flat = np.zeros((R_pad, D), np.float32)
    v_flat = np.zeros((R_pad, D), np.float32)
    row_head = np.full((R_pad,), -1, np.int32)
    r = 0
    k = rng.standard_normal((Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((Hkv, C, D)).astype(np.float32)
    for h in range(Hkv):
        k_flat[r:r + lens[h]] = k[h, :lens[h]]
        v_flat[r:r + lens[h]] = v[h, :lens[h]]
        row_head[r:r + lens[h]] = h
        r += lens[h]
    return k, v, k_flat, v_flat, row_head, np.asarray(lens)


def test_flat_decode(rng):
    from kvzip_tpu.ops.flat_decode import flat_decode_attend
    k, v, k_flat, v_flat, row_head, lens = _flat_inputs(rng)
    tail_cap, tail_used, T = 128, 3, 1
    k_tail = rng.standard_normal((Hkv, tail_cap, D)).astype(np.float32)
    v_tail = rng.standard_normal((Hkv, tail_cap, D)).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    got = flat_decode_attend(
        q, jnp.asarray(k_flat.T, jnp.bfloat16),
        jnp.asarray(v_flat, jnp.bfloat16), jnp.asarray(row_head),
        jnp.asarray(k_tail, jnp.bfloat16), jnp.asarray(v_tail, jnp.bfloat16),
        jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=256)

    k_dense = np.zeros((Hkv, C + tail_cap, D), np.float32)
    v_dense = np.zeros((Hkv, C + tail_cap, D), np.float32)
    for h in range(Hkv):
        k_dense[h, :lens[h]] = k[h, :lens[h]]
        v_dense[h, :lens[h]] = v[h, :lens[h]]
        k_dense[h, lens[h]:lens[h] + tail_used + T] = k_tail[h, :tail_used + T]
        v_dense[h, lens[h]:lens[h] + tail_used + T] = v_tail[h, :tail_used + T]
    want = _dense_ref(q, jnp.asarray(k_dense, jnp.bfloat16),
                      jnp.asarray(v_dense, jnp.bfloat16),
                      jnp.asarray(lens + tail_used, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=3e-2)


def test_flat_decode_int4(rng):
    from kvzip_tpu.ops.flat_decode import (flat_decode_attend,
                                           flat_decode_attend_int4)
    from kvzip_tpu.ops.quant import dequantize_int4, quantize_int4
    _, _, k_flat, v_flat, row_head, _ = _flat_inputs(rng)
    tail_cap, tail_used, T = 128, 2, 1
    k_tail = jnp.asarray(
        rng.standard_normal((Hkv, tail_cap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(
        rng.standard_normal((Hkv, tail_cap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    kq, ks, kz = quantize_int4(jnp.asarray(k_flat), pack="split")
    vq, vs, vz = quantize_int4(jnp.asarray(v_flat), pack="split")
    got = flat_decode_attend_int4(
        q, kq.T, ks[:, 0].astype(jnp.float32), kz[:, 0].astype(jnp.float32),
        vq.T, vs[:, 0].astype(jnp.float32), vz[:, 0].astype(jnp.float32),
        jnp.asarray(row_head), k_tail, v_tail,
        jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=256)

    k_deq = dequantize_int4(kq, ks, kz, jnp.bfloat16, pack="split")
    v_deq = dequantize_int4(vq, vs, vz, jnp.bfloat16, pack="split")
    want = flat_decode_attend(
        q, k_deq.T, v_deq, jnp.asarray(row_head), k_tail, v_tail,
        jnp.asarray(tail_used, jnp.int32), scale=SCALE, block=256)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=5e-2)


def test_fused_scores(rng):
    from kvzip_tpu.ops.attention import reconstruction_scores
    from kvzip_tpu.ops.score_kernel import fused_scores
    sink, s_ctx, T = 128, 256, 128
    K = sink + s_ctx + T
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)
    keys = jnp.asarray(rng.standard_normal((Hkv, K, D)), jnp.bfloat16)
    ctx_len = jnp.asarray(200, jnp.int32)
    q_valid = jnp.asarray(T - 16, jnp.int32)

    got = fused_scores(q, keys, ctx_len, q_valid, sink=sink, s_ctx=s_ctx,
                       scale=SCALE, model_dtype=jnp.bfloat16)
    want = reconstruction_scores(
        q, keys[:, :sink], keys[:, sink:sink + s_ctx],
        jnp.swapaxes(keys[:, sink + s_ctx:], 0, 1), ctx_len, scale=SCALE,
        q_valid=q_valid, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got[:, :200], np.float32),
        np.asarray(want[:, :200], np.float32), rtol=0, atol=2e-2)


def test_flat_decode_int4_q8(rng):
    """int8-attention mode compiled on chip: s8 dots + bias-corrected
    nibbles stay close to the exact int4 path."""
    from kvzip_tpu.ops.flat_decode import flat_decode_attend_int4
    from kvzip_tpu.ops.quant import quantize_int4
    _, _, k_flat, v_flat, row_head, _ = _flat_inputs(rng)
    tail_cap, tail_used, T = 128, 2, 1
    k_tail = jnp.asarray(
        rng.standard_normal((Hkv, tail_cap, D)), jnp.bfloat16)
    v_tail = jnp.asarray(
        rng.standard_normal((Hkv, tail_cap, D)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.bfloat16)

    kq, ks, kz = quantize_int4(jnp.asarray(k_flat), pack="split")
    vq, vs, vz = quantize_int4(jnp.asarray(v_flat), pack="split")
    args = (q, kq.T, ks[:, 0].astype(jnp.float32),
            kz[:, 0].astype(jnp.float32), vq.T,
            vs[:, 0].astype(jnp.float32), vz[:, 0].astype(jnp.float32),
            jnp.asarray(row_head), k_tail, v_tail,
            jnp.asarray(tail_used, jnp.int32))
    exact = flat_decode_attend_int4(*args, scale=SCALE, block=256)
    got = flat_decode_attend_int4(*args, scale=SCALE, block=256, q8=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(exact, np.float32),
        rtol=0, atol=8e-2)


def test_w4a8_matmul_tpu(rng):
    """W4A8 Pallas linear compiled on chip vs dequantized reference."""
    from kvzip_tpu.ops.w4a8 import (dequantize_weight_int4,
                                    quantize_weight_int4, w4a8_matmul)
    for T in (1, 16):
        x = jnp.asarray(rng.standard_normal((T, 256)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((256, 512)) * 0.05, jnp.float32)
        wq = quantize_weight_int4(w)
        got = w4a8_matmul(x, wq["q4"], wq["s"], wq["z"])
        want = (x.astype(jnp.float32)
                @ dequantize_weight_int4(wq, jnp.float32)).astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=0, atol=0.1)
