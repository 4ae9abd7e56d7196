"""Pallas flash prefill kernel vs dense reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from kvzip_tpu.ops.attention import attend_dense
from kvzip_tpu.ops import flash


def run_flash(*args, **kw):
    with pltpu.force_tpu_interpret_mode():
        return flash.flash_attend(*args, **kw)


@pytest.mark.parametrize("T,base,C", [(8, 16, 64), (16, 0, 32), (32, 33, 128)])
def test_flash_matches_dense(T, base, C):
    rng = np.random.default_rng(0)
    Hkv, G, D = 2, 2, 8
    H = Hkv * G
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    lens = jnp.asarray([base, max(base - 5, 0)], jnp.int32)

    want = attend_dense(q, k, v, lens, None, scale=D ** -0.5)
    got = run_flash(q, k, v, lens, jnp.asarray(base, jnp.int32),
                    scale=D ** -0.5, block_q=8, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_sliding_window():
    rng = np.random.default_rng(1)
    Hkv, G, D, T, C = 1, 2, 8, 16, 64
    base = 20
    q = jnp.asarray(rng.standard_normal((T, Hkv * G, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Hkv, C, D)), jnp.float32)
    lens = jnp.asarray([base], jnp.int32)
    pos0 = jnp.asarray(base, jnp.int32)

    want = attend_dense(q, k, v, lens, None, scale=D ** -0.5,
                        q_pos0=pos0, window=9)
    got = run_flash(q, k, v, lens, pos0, scale=D ** -0.5, window=9,
                    block_q=8, block_k=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
