"""INT4 flash prefill kernel vs the jnp int4 blockwise path (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.ops.attention import attend_blockwise_int4
from kvzip_tpu.ops.flash_int4 import flash_attend_int4
from kvzip_tpu.ops.quant import quantize_int4


@pytest.mark.parametrize("T,base", [(16, 24), (32, 0), (16, 100),
                                    (1, 40), (4, 64)])
def test_flash_int4_matches_blockwise(T, base):
    rng = np.random.default_rng(0)
    Hkv, G, D, C = 2, 2, 128, 128
    H = Hkv * G
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = rng.standard_normal((Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((Hkv, C, D)).astype(np.float32)
    lens = jnp.asarray([base, max(base - 7, 0)], jnp.int32)

    kq, ks, kz = quantize_int4(jnp.asarray(k), pack="split")
    vq, vs, vz = quantize_int4(jnp.asarray(v), pack="split")

    want = attend_blockwise_int4(q, kq, ks, kz, vq, vs, vz, lens, None,
                                 scale=D ** -0.5, kv_block=32)
    got = flash_attend_int4(
        q, jnp.swapaxes(kq, 1, 2), ks[..., 0], kz[..., 0],
        jnp.swapaxes(vq, 1, 2), vs[..., 0], vz[..., 0], lens,
        jnp.asarray(base, jnp.int32), scale=D ** -0.5,
        block_q=8, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
