"""Ragged decode kernel vs dense reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kvzip_tpu.ops.attention import attend_dense
from kvzip_tpu.ops.ragged_decode import ragged_decode_attend


@pytest.mark.parametrize("T,lens", [(1, [25, 7, 40]), (4, [16, 0, 63]),
                                    (8, [8, 32, 5])])
def test_ragged_decode_matches_dense(T, lens):
    rng = np.random.default_rng(0)
    Hkv, G, D, C = 3, 2, 8, 64
    H = Hkv * G
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    base = jnp.asarray(lens, jnp.int32)

    want = attend_dense(q, k, v, base, None, scale=D ** -0.5)
    got = ragged_decode_attend(q, k, v, base, scale=D ** -0.5, block_kv=16,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
