"""Pallas decode attention over the POOL layout (`kvzip_tpu.pool`).

Same math as `ops.flat_decode` (online softmax over frozen context blocks +
a bf16 tail folded in at the last step; INT4 quant params folded out of the
matmuls algebraically), but the context arrays hold EVERY layer's kept rows
concatenated in one pool:

- the grid is one axis of ``nb_max`` key blocks; the index maps add the
  current layer's block offset (prefetched scalars — same trick as the
  stacked flat kernels' layer select, no host-side slice copy);
- layers with fewer live blocks than ``nb_max`` clamp their index map to
  their last block: Pallas skips the copy when consecutive steps map to the
  same block, so a dead step costs only the ~2 us grid-step floor and the
  kernel reads exactly the live footprint of the CURRENT layer (+ at most
  one alignment block of padding, masked via ``row_head == -1``).

This is what makes head-level eviction decode FAST: the round-3 uniform
r_pad flat stack degenerated to full capacity whenever one layer kept all
its heads (reference head-level parity: `model/wrapper.py:40-58` decodes
through the same varlen fast path as pair level, `attention/attn.py:56-73`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _pick_block(max_rows: int, align: int, rows_q: int) -> int:
    """Key-block size: a power of two dividing ``align`` (so every layer
    offset is block-aligned), capped by the (rows_q, BLK) f32 score tile's
    VMEM budget, targeting a grid near ~32 steps at decode shapes.

    Up to 64k-row blocks at huge contexts: the decode-step CONSTANT of a
    28-layer model includes every dead (clamped) grid step of every
    launch, measured at ~0.9 ms/step with 32k blocks at 480k
    (tools/profile_decode_r5.py) — halving the step count takes a direct
    bite out of it on BOTH the pruned and full sides."""
    a = 1 << (align.bit_length() - 1)
    if a != align:
        raise ValueError(f"pool align must be a power of two, got {align}")
    tgt = max(128, max_rows // 32)
    blk = 1 << max(tgt - 1, 1).bit_length()
    vmem_cap = max(128, (12 * 2 ** 20 // (4 * rows_q)) // 128 * 128)
    cap = 1 << (min(vmem_cap, 65536).bit_length() - 1)
    return max(128, min(blk, cap, align))


def _online_update(sl, s, v_fn, m_scr, l_scr, acc_scr):
    """One online-softmax step on scratch slice ``sl`` from scores ``s``;
    ``v_fn(p)`` returns the (rows, D) value contribution (plus any rank-1
    correction already added)."""
    m_prev = m_scr[sl]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
    l_scr[sl] = l_scr[sl] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[sl] = acc_scr[sl] * alpha + v_fn(p)
    m_scr[sl] = m_new


def _pool_int4_kernel(meta_ref, q_ref, rh_ref, kq_ref, ks_ref, kz_ref,
                      vq_ref, vs_ref, vz_ref, kt_ref, vt_ref,
                      o_ref, m_scr, l_scr, acc_scr,
                      *, num_layers: int, nb_max: int, n_q: int, g: int,
                      scale: float, dtype, q8: bool, stacked_tail: bool):
    kb = pl.program_id(0)
    HT, D = q_ref.shape
    Hkv, Tcap, _ = kt_ref.shape[-3:]
    layer = meta_ref[0]
    nb_l = meta_ref[1 + num_layers + layer]

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = q_ref[...]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = (r_ids // n_q) // g
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
    q_hi = (q[:, :D // 2] * q.dtype.type(1.0 / 16.0)).astype(jnp.float32)
    q_lo = q[:, D // 2:].astype(jnp.float32) - q_hi

    @pl.when(kb < nb_l)
    def _():
        # ---- scores: lo-only unpack + packed-byte matmul (flat_decode) ----
        if q8:
            kB = jax.lax.bitcast_convert_type(kq_ref[...] ^ 0x80, jnp.int8)
            kLO = jax.lax.bitcast_convert_type(kq_ref[...] & 0xF, jnp.int8)

            def quant_rows(x):
                s = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0 + 1e-20
                return jnp.round(x / s).astype(jnp.int8), s

            qh8, qh_s = quant_rows(q_hi)
            ql8, ql_s = quant_rows(q_lo)
            a = jax.lax.dot_general(qh8, kB, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            bsum = jnp.sum(qh8.astype(jnp.float32), axis=1, keepdims=True)
            m_lo = jax.lax.dot_general(ql8, kLO, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            qn = (qh_s * (a.astype(jnp.float32) + 128.0 * bsum)
                  + ql_s * m_lo.astype(jnp.float32))
        else:
            kpi = kq_ref[...].astype(jnp.int32)
            kB = kpi.astype(q.dtype)
            kLO = (kpi & 0xF).astype(q.dtype)
            qn = (jax.lax.dot_general(
                q_hi.astype(q.dtype), kB, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    q_lo.astype(q.dtype), kLO, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        s = (qn * ks_ref[...] + qsum * kz_ref[...]) * scale
        s = jnp.where(rh_ref[...] == q_kvhead, s, NEG_INF)

        vs = vs_ref[...]
        vz = vz_ref[...]

        def v_contrib(p):
            ps = p * vs
            pz = jnp.sum(p * vz, axis=1, keepdims=True)
            if q8:
                vB = jax.lax.bitcast_convert_type(
                    vq_ref[...] ^ 0x80, jnp.int8)
                vLO = jax.lax.bitcast_convert_type(
                    vq_ref[...] & 0xF, jnp.int8)
                ps_s = jnp.max(ps, axis=1, keepdims=True) / 127.0 + 1e-20
                pp = jnp.round(ps / ps_s).astype(jnp.int8)
                psum = jnp.sum(pp.astype(jnp.float32), axis=1, keepdims=True)
                m1i = jax.lax.dot_general(pp, vB, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                m2i = jax.lax.dot_general(pp, vLO, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                m1 = ps_s * (m1i.astype(jnp.float32) + 128.0 * psum)
                m2 = ps_s * m2i.astype(jnp.float32)
            else:
                vpi = vq_ref[...].astype(jnp.int32)
                m1 = jax.lax.dot_general(
                    ps, vpi.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m2 = jax.lax.dot_general(
                    ps, (vpi & 0xF).astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return jnp.concatenate(
                [(m1 - m2) * (1.0 / 16.0), m2], axis=1) + pz

        _online_update(slice(None), s, v_contrib, m_scr, l_scr, acc_scr)

    # ---- tail (query/answer KV) folded in at the last grid step ----
    @pl.when(kb == nb_max - 1)
    def _():
        rows_h = g * n_q
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
        for hh in range(Hkv):
            maskt = col_t < meta_ref[1 + 2 * num_layers + hh] + qi + 1
            sl = slice(hh * rows_h, (hh + 1) * rows_h)
            ktl = kt_ref[0, hh] if stacked_tail else kt_ref[hh]
            vtl = vt_ref[0, hh] if stacked_tail else vt_ref[hh]
            st = jax.lax.dot_general(
                q[sl], ktl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            st = jnp.where(maskt, st, NEG_INF)
            _online_update(
                sl, st,
                lambda p: jax.lax.dot_general(
                    p.astype(vtl.dtype), vtl,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32),
                m_scr, l_scr, acc_scr)

        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


def _pool_bf16_kernel(meta_ref, q_ref, rh_ref, kf_ref, vf_ref, kt_ref,
                      vt_ref, o_ref, m_scr, l_scr, acc_scr,
                      *, num_layers: int, nb_max: int, n_q: int, g: int,
                      scale: float, dtype, stacked_tail: bool):
    kb = pl.program_id(0)
    HT, D = q_ref.shape
    Hkv, Tcap, _ = kt_ref.shape[-3:]
    layer = meta_ref[0]
    nb_l = meta_ref[1 + num_layers + layer]

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = q_ref[...]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = (r_ids // n_q) // g

    @pl.when(kb < nb_l)
    def _():
        s = jax.lax.dot_general(
            q, kf_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(rh_ref[...] == q_kvhead, s, NEG_INF)
        _online_update(
            slice(None), s,
            lambda p: jax.lax.dot_general(
                p.astype(vf_ref.dtype), vf_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32),
            m_scr, l_scr, acc_scr)

    @pl.when(kb == nb_max - 1)
    def _():
        rows_h = g * n_q
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
        for hh in range(Hkv):
            maskt = col_t < meta_ref[1 + 2 * num_layers + hh] + qi + 1
            sl = slice(hh * rows_h, (hh + 1) * rows_h)
            ktl = kt_ref[0, hh] if stacked_tail else kt_ref[hh]
            vtl = vt_ref[0, hh] if stacked_tail else vt_ref[hh]
            st = jax.lax.dot_general(
                q[sl], ktl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            st = jnp.where(maskt, st, NEG_INF)
            _online_update(
                sl, st,
                lambda p: jax.lax.dot_general(
                    p.astype(vtl.dtype), vtl,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32),
                m_scr, l_scr, acc_scr)

        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


def _meta(layer, layer_off, layer_rows, tail_len, Hkv_all, BLK):
    """Prefetched scalars: [layer, block offsets (L,), live blocks (L,),
    tail lengths (Hkv,)]. Dead layers still own >= 1 (padding) block so the
    clamped index map never goes negative."""
    off_blk = (layer_off // BLK).astype(jnp.int32)
    nb = jnp.maximum(-(-layer_rows // BLK), 1).astype(jnp.int32)
    tl = tail_len.astype(jnp.int32)
    tl = jnp.broadcast_to(tl, (Hkv_all,)) if tl.ndim == 0 else tl
    return jnp.concatenate([layer.astype(jnp.int32)[None], off_blk, nb, tl])


def _blk_map(L: int):
    """Pool index map: step through the CURRENT layer's blocks, clamped to
    its last live block (consecutive equal indices skip the DMA — dead
    steps only pay the grid-step floor)."""
    def blk(kb, m):
        layer = m[0]
        nb_l = m[1 + L + layer]
        return (0, m[1 + layer] + jnp.minimum(kb, nb_l - 1))

    return blk


@functools.partial(
    jax.jit,
    static_argnames=("scale", "align", "max_rows", "block", "interpret",
                     "q8"))
def pool_decode_attend_int4(
    q: jax.Array,          # (T, H, D)
    k_pool_q: jax.Array,   # (D//2, P) uint8 TRANSPOSED nibbles
    k_pool_s: jax.Array,   # (1, P) f32
    k_pool_z: jax.Array,
    v_pool_q: jax.Array,   # (D//2, P) uint8 TRANSPOSED
    v_pool_s: jax.Array,
    v_pool_z: jax.Array,
    row_head: jax.Array,   # (1, P) int32
    layer_off: jax.Array,  # (L,) int32 row offsets
    layer_rows: jax.Array,  # (L,) int32 live rows
    k_tail: jax.Array,     # (Hkv, T_cap, D) bf16 — CURRENT layer's tail,
    v_tail: jax.Array,     # or (L, Hkv, T_cap, D): the FULL tail stacks —
    tail_len: jax.Array,   # the prefetched layer scalar selects the block
    layer: jax.Array,      # (saves the decode scan's per-layer slice COPY
    *,                     # + scatter-back, ~0.4 ms/step at a 1280 cap)
    scale: float,
    align: int,
    max_rows: int,
    block: int = 32768,
    interpret: bool = False,
    q8: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    stacked_tail = k_tail.ndim == 4
    Hkv, Tcap, _ = k_tail.shape[-3:]
    G = H // Hkv
    L = layer_off.shape[0]
    HT = H * T

    BLK = min(_pick_block(max_rows, align, HT), block)
    nb_max = -(-max_rows // BLK)

    q2 = q.transpose(1, 0, 2).reshape(HT, D)
    meta = _meta(layer, layer_off, layer_rows, tail_len, Hkv, BLK)

    blk = _blk_map(L)
    if stacked_tail:
        tail_spec = pl.BlockSpec((1, Hkv, Tcap, D),
                                 lambda kb, m: (m[0], 0, 0, 0))
    else:
        tail_spec = pl.BlockSpec((Hkv, Tcap, D), lambda kb, m: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_max,),
        in_specs=[
            pl.BlockSpec((HT, D), lambda kb, m: (0, 0)),
            pl.BlockSpec((1, BLK), blk),          # row_head
            pl.BlockSpec((D // 2, BLK), blk),     # k nibbles
            pl.BlockSpec((1, BLK), blk),          # k scale
            pl.BlockSpec((1, BLK), blk),          # k zero
            pl.BlockSpec((D // 2, BLK), blk),     # v nibbles
            pl.BlockSpec((1, BLK), blk),          # v scale
            pl.BlockSpec((1, BLK), blk),          # v zero
            tail_spec,
            tail_spec,
        ],
        out_specs=pl.BlockSpec((HT, D), lambda kb, m: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _pool_int4_kernel, num_layers=L, nb_max=nb_max, n_q=T, g=G,
        scale=scale, dtype=q.dtype, q8=q8, stacked_tail=stacked_tail)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HT, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(meta, q2, row_head.astype(jnp.int32), k_pool_q,
      k_pool_s.astype(jnp.float32), k_pool_z.astype(jnp.float32),
      v_pool_q, v_pool_s.astype(jnp.float32),
      v_pool_z.astype(jnp.float32), k_tail, v_tail)

    return out.reshape(H, T, D).transpose(1, 0, 2)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "align", "max_rows", "block", "interpret"))
def pool_decode_attend(
    q: jax.Array,          # (T, H, D)
    k_pool: jax.Array,     # (D, P) — TRANSPOSED
    v_pool: jax.Array,     # (P, D)
    row_head: jax.Array,   # (1, P) int32
    layer_off: jax.Array,  # (L,)
    layer_rows: jax.Array,
    k_tail: jax.Array,     # (Hkv, T_cap, D) — CURRENT layer's tail, or
    v_tail: jax.Array,     # (L, Hkv, T_cap, D) full stacks (layer-selected
    tail_len: jax.Array,   # by the prefetched scalar, no slice copy)
    layer: jax.Array,
    *,
    scale: float,
    align: int,
    max_rows: int,
    block: int = 32768,
    interpret: bool = False,
) -> jax.Array:
    T, H, D = q.shape
    stacked_tail = k_tail.ndim == 4
    Hkv, Tcap, _ = k_tail.shape[-3:]
    G = H // Hkv
    L = layer_off.shape[0]
    HT = H * T

    BLK = min(_pick_block(max_rows, align, HT), block)
    nb_max = -(-max_rows // BLK)

    q2 = q.transpose(1, 0, 2).reshape(HT, D)
    meta = _meta(layer, layer_off, layer_rows, tail_len, Hkv, BLK)

    blk = _blk_map(L)

    def vblk(kb, m):
        layer = m[0]
        nb_l = m[1 + L + layer]
        return (m[1 + layer] + jnp.minimum(kb, nb_l - 1), 0)

    if stacked_tail:
        tail_spec = pl.BlockSpec((1, Hkv, Tcap, D),
                                 lambda kb, m: (m[0], 0, 0, 0))
    else:
        tail_spec = pl.BlockSpec((Hkv, Tcap, D), lambda kb, m: (0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_max,),
        in_specs=[
            pl.BlockSpec((HT, D), lambda kb, m: (0, 0)),
            pl.BlockSpec((1, BLK), blk),          # row_head
            pl.BlockSpec((D, BLK), blk),          # k (transposed)
            pl.BlockSpec((BLK, D), vblk),         # v (row-major)
            tail_spec,
            tail_spec,
        ],
        out_specs=pl.BlockSpec((HT, D), lambda kb, m: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, 1), jnp.float32),
            pltpu.VMEM((HT, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _pool_bf16_kernel, num_layers=L, nb_max=nb_max, n_q=T, g=G,
        scale=scale, dtype=q.dtype, stacked_tail=stacked_tail)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HT, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=interpret,
    )(meta, q2, row_head.astype(jnp.int32), k_pool, v_pool, k_tail, v_tail)

    return out.reshape(H, T, D).transpose(1, 0, 2)
