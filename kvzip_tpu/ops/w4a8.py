"""W4A8 linear: INT4 weights (per-group-128 asymmetric) in a Pallas kernel.

Beyond the reference's W8A8 stack (`model/quant_model/w8a8kv4_llama.py` keeps
8-bit weights): 4-bit weights halve the decode-time weight read — the
dominant HBM term of a single-stream decode step — at QServe-style per-group
granularity (group of 128 input channels per output channel, asymmetric
scale/zero, the same geometry as QServe's W4A8 checkpoints).

Layout (mirrors the flat-decode int4 algebra, `ops/flat_decode.py`):

- packed ``(IN, OUT//2)`` uint8, split packing along OUT: byte column j holds
  weight column j in the HIGH nibble and column j + OUT/2 in the LOW nibble.
  With ``b = 16*hi + lo`` two NN matmuls against the raw bytes reconstruct
  both halves without ever materializing unpacked nibbles:

      m1 = x @ b, m2 = x @ (b & 15)  ->  hi = (m1 - m2)/16, lo = m2

- scale/zero ``(IN//128, OUT)``: with per-INPUT-group quant params,
  ``out_j = sum_g s[g,j] * (x_g . n_gj) + z[g,j] * sum(x_g)`` — the grid
  walks input groups, so each step applies its group's row of scales and a
  rank-1 zero correction; no dequantized weight tile is ever built.

The kernel generalizes over T (decode T=1 up to prefill chunks): row blocks
of x ride the first grid axis, input groups the second (accumulating into a
stationary output block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def quantize_weight_int4(w: jax.Array, group: int = GROUP) -> dict:
    """w (..., IN, OUT) -> {"q4": (..., IN, OUT//2) uint8, "s"/"z":
    (..., IN//group, OUT) f32} — per-(input-group, output-channel)
    asymmetric uint4, split-packed along OUT."""
    *lead, IN, OUT = w.shape
    assert IN % group == 0 and OUT % 2 == 0
    wf = w.astype(jnp.float32).reshape(*lead, IN // group, group, OUT)
    mn = wf.min(axis=-2)
    mx = wf.max(axis=-2)
    s = (mx - mn) / 15.0 + 1e-8                      # (..., G, OUT)
    z = mn
    q = jnp.clip(jnp.round((wf - z[..., None, :]) / s[..., None, :]), 0, 15)
    q = q.astype(jnp.uint8).reshape(*lead, IN, OUT)
    half = OUT // 2
    packed = (q[..., :half] << 4) | q[..., half:]
    return {"q4": packed, "s": s.astype(jnp.float32),
            "z": z.astype(jnp.float32)}


def dequantize_weight_int4(wq: dict, dtype=jnp.bfloat16) -> jax.Array:
    """Reference expansion (tests / non-TPU fallback)."""
    packed, s, z = wq["q4"], wq["s"], wq["z"]
    *lead, IN, half = packed.shape
    hi = (packed >> 4).astype(jnp.float32)
    lo = (packed & 0xF).astype(jnp.float32)
    q = jnp.concatenate([hi, lo], axis=-1)           # (..., IN, OUT)
    G = s.shape[-2]
    qg = q.reshape(*lead, G, IN // G, 2 * half)
    x = qg * s[..., None, :] + z[..., None, :]
    return x.reshape(*lead, IN, 2 * half).astype(dtype)


def _w4a8_kernel(x_ref, wq_ref, s_ref, z_ref, o_ref, acc_scr,
                 *, n_groups: int, dtype):
    gb = pl.program_id(1)
    T, BKIN = x_ref.shape
    half = wq_ref.shape[1]

    @pl.when(gb == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    xsum = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)  # (T, 1)
    b = wq_ref[...].astype(x.dtype)                  # (BKIN, half)
    lo = (wq_ref[...] & 0xF).astype(x.dtype)
    m1 = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m2 = jax.lax.dot_general(x, lo, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    qn = jnp.concatenate([(m1 - m2) * (1.0 / 16.0), m2], axis=1)  # (T, OUT)
    acc_scr[...] += qn * s_ref[0] + xsum * z_ref[0]

    @pl.when(gb == n_groups - 1)
    def _():
        o_ref[...] = acc_scr[...].astype(dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def w4a8_matmul(x: jax.Array, wq4: jax.Array, ws: jax.Array, wz: jax.Array,
                bias=None, *, block_t: int = 256,
                interpret: bool = False) -> jax.Array:
    """x (T, IN) x int4-packed weights -> (T, OUT) in x.dtype.

    wq4 (IN, OUT//2) uint8 split-packed; ws/wz (IN//128, OUT) f32.
    """
    T, IN = x.shape
    half = wq4.shape[1]
    OUT = 2 * half
    n_groups = IN // GROUP
    BT = min(block_t, max(8, T))
    # pad T to a block multiple (decode T=1 -> one 8-row block)
    Tp = -(-T // BT) * BT
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))

    grid = (Tp // BT, n_groups)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, n_groups=n_groups, dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, GROUP), lambda tb, gb: (tb, gb)),
            pl.BlockSpec((GROUP, half), lambda tb, gb: (gb, 0)),
            pl.BlockSpec((1, OUT), lambda tb, gb: (gb, 0)),
            pl.BlockSpec((1, OUT), lambda tb, gb: (gb, 0)),
        ],
        out_specs=pl.BlockSpec((BT, OUT), lambda tb, gb: (tb, 0)),
        out_shape=jax.ShapeDtypeStruct((Tp, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((BT, OUT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, wq4, ws, wz)
    out = out[:T]
    if bias is not None:
        out = out + bias
    return out


def w4a8_linear(x: jax.Array, w: dict, bias=None,
                interpret: bool = False) -> jax.Array:
    """Linear over a {"q4","s","z"} int4 weight dict (jnp fallback off-TPU)."""
    if interpret or jax.default_backend() == "cpu":
        return w4a8_matmul(x, w["q4"], w["s"], w["z"], bias, interpret=True) \
            if x.shape[0] <= 8 else _w4a8_jnp(x, w, bias)
    return w4a8_matmul(x, w["q4"], w["s"], w["z"], bias)


def _w4a8_jnp(x: jax.Array, w: dict, bias=None) -> jax.Array:
    y = x @ dequantize_weight_int4(w, x.dtype)
    return y if bias is None else y + bias
