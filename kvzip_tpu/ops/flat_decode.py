"""Pallas decode attention over the flat compacted cache.

After KVzip eviction the context KV is FROZEN (only query/answer KV is ever
appended, and it is dropped again after each generation —
`model/wrapper.py:276-284`). That makes a two-part layout optimal on TPU:

- flat context: every head's kept rows concatenated densely (reference
  ``prepare_init`` builds the same flattened view for varlen flash-attn,
  `attention/kvcache.py:152-185`) with a per-row ``row_head`` id; pad rows
  carry head id -1 and can never match a query. **K is stored transposed**
  ``(D, R_pad)`` so the score matmul contracts q's minor dim against K's
  major dim — the MXU-friendly NN orientation (the NT orientation, minor
  contracting with minor, hits a Mosaic slow path ~7x off peak on v5e).
- ``k_tail/v_tail (H_kv, T_cap, D)``: a small static append buffer for the
  query + generated tokens; O(1) snapshot/restore by resetting its length.

Decode attention then reads exactly ``sum_h len_h`` rows (the true compressed
footprint — not the per-head-padded capacity), with a tiny grid and trivial
index maps: the kernel streams flat blocks, masks rows by head-id match, and
folds the whole tail in at the last grid step.

The INT4 variant never materializes dequantized K/V tiles. With per-row
scale/zero (``x = n*s_r + z_r``, nibbles n in [0,15]) the algebra folds the
quant params out of the matmuls:

- scores:  ``q . x_r = s_r * (q . n_r) + z_r * sum(q)`` — one matmul against
  the raw nibbles, then a column scale + rank-1 zero-point correction.
- output:  ``sum_r p_r x_r = (p * s) @ n + (sum_r p_r z_r)`` — scale the
  probabilities instead of the values, plus a scalar-per-query correction.

This removes the per-block dequant chains (shift/mask/scale/add over the
whole tile) that dominated the v1 kernel and keeps both matmuls NN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _pick_block(R: int, block: int, rows: int) -> int:
    """Key-block size: fits the (rows, BLK) fp32 score tile (and its exp/
    matmul temporaries) in VMEM and divides R. Rounded DOWN to a power of
    two first — R is a multiple of a power of two, so a non-power-of-two
    start could skip every lane-aligned divisor and collapse to BLK=1
    (ADVICE r1).

    At large R the per-grid-step fixed cost (~2-4 us) dominates small
    blocks — 8192-row blocks at a 2.4M-row full-flat view cost ~24 ms of
    pure floor per 28-layer decode step — so the target grows to keep the
    grid near ~24 steps (callers round r_pad to 32768 at large contexts
    so 16k/32k blocks divide it)."""
    tgt = max(block, R // 24)
    blk = 1 << max(tgt - 1, 1).bit_length()          # round UP to pow2
    vmem_cap = max(128, (6 * 2 ** 20 // (4 * rows)) // 128 * 128)
    cap = 1 << (min(vmem_cap, 32768).bit_length() - 1)  # round cap DOWN
    blk = min(blk, cap)
    while R % blk and blk > 1:
        blk //= 2
    return blk


def _flat_kernel(meta_ref, q_ref, rh_ref, kf_ref, vf_ref, kt_ref, vt_ref,
                 o_ref, m_scr, l_scr, acc_scr,
                 *, block: int, n_q: int, g: int, scale: float, dtype):
    sb = pl.program_id(0)          # sequence (merged-batch decode; 1 else)
    kb = pl.program_id(1)          # key block WITHIN this sequence's rows
    nb = pl.num_programs(1)
    HT, D = q_ref.shape  # rows = H * n_q of ONE sequence
    Tcap = kt_ref.shape[1]
    Hkv = kt_ref.shape[0]          # kv heads of ONE sequence

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = q_ref[...]
    # kv head of each q row: r -> (r // n_q) // g, offset by this
    # sequence's merged head base (row_head values are global)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = (r_ids // n_q) // g + sb * Hkv  # (HT, 1)

    # ---- flat context block (K transposed: (D, BLK) -> NN matmul) ----
    s = jax.lax.dot_general(
        q, kf_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (HT, block)
    rh = rh_ref[0]  # (1, block) head id per flat row (-1 pad)
    mask = rh == q_kvhead
    s = jnp.where(mask, s, NEG_INF)
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_new
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(vf_ref.dtype), vf_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- tail (query/answer KV) folded in at the last step ----
    # block-diagonal: each kv head's query rows [h*g*n_q, (h+1)*g*n_q) only
    # see that head's tail — loop per head keeps VMEM at (g*n_q, Tcap)
    @pl.when(kb == nb - 1)
    def _():
        rows_h = g * n_q
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
        for hh in range(Hkv):
            # per-head tail length (merged-batch decode: one independent
            # sequence per merged head group)
            maskt = col_t < meta_ref[1 + sb * Hkv + hh] + qi + 1
            sl = slice(hh * rows_h, (hh + 1) * rows_h)
            st = jax.lax.dot_general(
                q[sl], kt_ref[hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (rows_h, Tcap)
            st = jnp.where(maskt, st, NEG_INF)
            m_prev = m_scr[sl]
            m_new = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isfinite(m_prev),
                              jnp.exp(m_prev - m_new), 0.0)
            pt = jnp.where(jnp.isfinite(st), jnp.exp(st - m_new), 0.0)
            l_scr[sl] = l_scr[sl] * alpha + jnp.sum(pt, axis=1, keepdims=True)
            acc_scr[sl] = acc_scr[sl] * alpha + jax.lax.dot_general(
                pt.astype(vt_ref.dtype), vt_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[sl] = m_new

        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


def _flat_int4_kernel(meta_ref, q_ref, rh_ref, kq_ref, ks_ref, kz_ref,
                      vq_ref, vs_ref, vz_ref, kt_ref, vt_ref,
                      o_ref, m_scr, l_scr, acc_scr,
                      *, block: int, n_q: int, g: int, scale: float, dtype,
                      q8: bool = False):
    """INT4-context variant. K nibbles arrive transposed ``(D//2, BLK)``
    (byte j packs element j in the high nibble, j + D/2 in the low — split
    packing), V row-major ``(BLK, D//2)``. Both matmuls run against the raw
    nibble values; scale/zero are applied as column scalings + rank-1
    corrections (see module docstring), so no dequantized tile is ever
    built.

    ``q8=True`` (opt-in int8 attention): queries and probabilities are
    quantized per row to s8 and both context matmuls run s8 x s8 -> s32 —
    the packed bytes are XOR'd with 0x80 in-register (bias -128, corrected
    by a rank-1 term) so no wide-type unpack chain runs on the big arrays.
    Measured ~1.5x the bf16 nibble path (VPU-bound); costs ~8-bit rounding
    of attention logits/probs against an already-4-bit KV."""
    sb = pl.program_id(0)
    kb = pl.program_id(1)
    nb = pl.num_programs(1)
    HT, D = q_ref.shape
    Tcap = kt_ref.shape[1]
    Hkv = kt_ref.shape[0]

    @pl.when(kb == 0)
    def _():
        m_scr[...] = jnp.full((HT, 1), NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros((HT, 1), jnp.float32)
        acc_scr[...] = jnp.zeros((HT, D), jnp.float32)

    q = q_ref[...]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HT, 1), 0)
    q_kvhead = (r_ids // n_q) // g + sb * Hkv
    qsum = jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)  # (HT, 1)

    # ---- scores: lo-only unpack + packed-byte matmul ----
    # split packing: byte row j holds 16*x_j + x_{j+D/2}, so
    #   q . x = (q_hi/16) . b  +  (q_lo - q_hi/16) . lo,   lo = b & 15
    # — the high nibble is never materialized. The full unpack chain
    # (cast/shift/and/2 casts/concat ~= 7 VPU ops per packed byte) pinned
    # this kernel at ~175 GB/s regardless of block size (VPU-bound, ~1e12
    # ops/s); this form measured 391 GB/s (tools/probe_flat_unpack.py B).
    q_hi = (q[:, :D // 2] * q.dtype.type(1.0 / 16.0)).astype(jnp.float32)
    q_lo = q[:, D // 2:].astype(jnp.float32) - q_hi
    if q8:
        # s8 dots on the raw bytes: kB' = (b ^ 0x80) as s8 = b - 128, so
        # q.b = q.kB' + 128*sum(q); lo already fits s8. Queries quantized
        # per row (scale = amax/127) — 2 u8 VPU ops on the big array vs the
        # ~5-op wide-type chain above.
        kB = jax.lax.bitcast_convert_type(kq_ref[0] ^ 0x80, jnp.int8)
        kLO = jax.lax.bitcast_convert_type(kq_ref[0] & 0xF, jnp.int8)

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
              + ql_s * m_lo.astype(jnp.float32))   # (HT, BLK)
    else:
        kpi = kq_ref[0].astype(jnp.int32)             # (D//2, BLK) packed
        kB = kpi.astype(q.dtype)
        kLO = (kpi & 0xF).astype(q.dtype)
        qn = (jax.lax.dot_general(
            q_hi.astype(q.dtype), kB, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                q_lo.astype(q.dtype), kLO, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))   # (HT, BLK)
    ks = ks_ref[0]                                 # (1, BLK) f32
    kz = kz_ref[0]
    s = (qn * ks + qsum * kz) * scale

    mask = rh_ref[0] == q_kvhead
    s = jnp.where(mask, s, NEG_INF)
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
    l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_new

    # ---- output: lo-only unpack, same identity on the value side ----
    #   out_hi = (ps.b - ps.lo) / 16,   out_lo = ps.lo
    # V nibbles arrive TRANSPOSED (D//2, BLK) — minor dim BLK keeps the
    # uint8 array tile-aligned in HBM (row-major (R, 64) pads 2x). The
    # contraction is f32 NT (fast; only bf16 NT is the Mosaic slow path).
    ps = p * vs_ref[0]                             # (HT, BLK) f32
    pz = jnp.sum(p * vz_ref[0], axis=1, keepdims=True)  # (HT, 1) f32
    if q8:
        vB = jax.lax.bitcast_convert_type(vq_ref[0] ^ 0x80, jnp.int8)
        vLO = jax.lax.bitcast_convert_type(vq_ref[0] & 0xF, jnp.int8)
        ps_s = jnp.max(ps, axis=1, keepdims=True) / 127.0 + 1e-20  # ps >= 0
        pp = jnp.round(ps / ps_s).astype(jnp.int8)
        psum = jnp.sum(pp.astype(jnp.float32), axis=1, keepdims=True)
        m1i = jax.lax.dot_general(pp, vB, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        m2i = jax.lax.dot_general(pp, vLO, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        m1 = ps_s * (m1i.astype(jnp.float32) + 128.0 * psum)
        m2 = ps_s * m2i.astype(jnp.float32)
    else:
        vpi = vq_ref[0].astype(jnp.int32)          # (D//2, BLK) packed
        vB = vpi.astype(jnp.float32)
        vLO = (vpi & 0xF).astype(jnp.float32)
        m1 = jax.lax.dot_general(
            ps, vB, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (HT, D//2)
        m2 = jax.lax.dot_general(
            ps, vLO, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    upd = jnp.concatenate([(m1 - m2) * (1.0 / 16.0), m2], axis=1)
    acc_scr[...] = acc_scr[...] * alpha + pz + upd

    @pl.when(kb == nb - 1)
    def _():
        rows_h = g * n_q
        col_t = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (rows_h, Tcap), 0) % n_q
        for hh in range(Hkv):
            maskt = col_t < meta_ref[1 + sb * Hkv + hh] + qi + 1
            sl = slice(hh * rows_h, (hh + 1) * rows_h)
            st = jax.lax.dot_general(
                q[sl], kt_ref[hh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            st = jnp.where(maskt, st, NEG_INF)
            m_prev = m_scr[sl]
            m_new = jnp.maximum(m_prev, jnp.max(st, axis=1, keepdims=True))
            a2 = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
            pt = jnp.where(jnp.isfinite(st), jnp.exp(st - m_new), 0.0)
            l_scr[sl] = l_scr[sl] * a2 + jnp.sum(pt, axis=1, keepdims=True)
            acc_scr[sl] = acc_scr[sl] * a2 + jax.lax.dot_general(
                pt.astype(vt_ref.dtype), vt_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[sl] = m_new

        o_ref[...] = (acc_scr[...] /
                      jnp.maximum(l_scr[...], 1e-37)).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block", "interpret", "q8", "n_seq"))
def flat_decode_attend_int4(
    q: jax.Array,          # (T, H, D)
    k_flat_q: jax.Array,   # ([L,] D//2, R_pad) uint8 — TRANSPOSED nibbles
    k_flat_s: jax.Array,   # ([L,] R_pad)
    k_flat_z: jax.Array,
    v_flat_q: jax.Array,   # ([L,] D//2, R_pad) uint8 — TRANSPOSED
    v_flat_s: jax.Array,
    v_flat_z: jax.Array,
    row_head: jax.Array,   # ([L,] R_pad) int32
    k_tail: jax.Array,     # (Hkv, T_cap, D) bf16
    v_tail: jax.Array,
    tail_len: jax.Array,
    *,
    scale: float,
    block: int = 8192,
    interpret: bool = False,
    q8: bool = False,
    n_seq: int = 1,
    layer: jax.Array = None,  # () int32 — REQUIRED with stacked (L, ...) args
) -> jax.Array:
    """Pass the FULL stacked cache arrays plus ``layer`` when calling from a
    per-layer scan: the layer is selected inside the Pallas index maps (via a
    prefetched scalar), so no host-side ``a[layer_idx]`` dynamic-slice COPY
    of the multi-MB context arrays is ever materialized. That copy tripled
    the kernel's effective HBM traffic (~190 GB/s observed vs ~396 GB/s for
    the kernel itself — tools/probe_flat_real.py).

    ``q8=True``: int8-attention mode (see :func:`_flat_int4_kernel`).

    ``n_seq > 1``: merged-batch decode — the flat rows are n_seq per-
    sequence segments of equal padded length concatenated seq-major, query
    heads/tails likewise; the grid adds a sequence axis so each sequence's
    queries visit ONLY its own key blocks (attention work stays linear in
    batch instead of quadratic)."""
    T, H_all, D = q.shape
    Hkv_all, Tcap, _ = k_tail.shape
    H = H_all // n_seq
    Hkv = Hkv_all // n_seq
    G = H // Hkv
    if layer is None:
        k_flat_q, k_flat_s, k_flat_z = (k_flat_q[None], k_flat_s[None],
                                        k_flat_z[None])
        v_flat_q, v_flat_s, v_flat_z = (v_flat_q[None], v_flat_s[None],
                                        v_flat_z[None])
        row_head = row_head[None]
        layer = jnp.zeros((), jnp.int32)
    R = k_flat_q.shape[2] // n_seq      # rows per sequence segment
    # per-seq row blocks must satisfy Mosaic's 8-row rule once n_seq > 1
    # (a block equal to the whole array is exempt); pad rows attend to
    # nothing (their q_kvhead exceeds every row_head in their segment)
    HT = H * T
    HTp = -(-HT // 8) * 8 if n_seq > 1 else HT
    BLK = _pick_block(R, block, HTp)
    nb = R // BLK

    q2 = q.transpose(1, 0, 2).reshape(n_seq, HT, D)
    if HTp != HT:
        q2 = jnp.pad(q2, ((0, 0), (0, HTp - HT), (0, 0)))
    q2 = q2.reshape(n_seq * HTp, D)
    tl = tail_len.astype(jnp.int32)
    tl = jnp.broadcast_to(tl, (Hkv_all,)) if tl.ndim == 0 else tl
    meta = jnp.concatenate([layer.astype(jnp.int32)[None], tl])

    def blk1(sb, kb, m):
        return (m[0], 0, sb * nb + kb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seq, nb),
        in_specs=[
            pl.BlockSpec((HTp, D), lambda sb, kb, m: (sb, 0)),
            pl.BlockSpec((1, 1, BLK), blk1),
            pl.BlockSpec((1, D // 2, BLK), blk1),
            pl.BlockSpec((1, 1, BLK), blk1),
            pl.BlockSpec((1, 1, BLK), blk1),
            pl.BlockSpec((1, D // 2, BLK), blk1),
            pl.BlockSpec((1, 1, BLK), blk1),
            pl.BlockSpec((1, 1, BLK), blk1),
            pl.BlockSpec((Hkv, Tcap, D), lambda sb, kb, m: (sb, 0, 0)),
            pl.BlockSpec((Hkv, Tcap, D), lambda sb, kb, m: (sb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((HTp, D), lambda sb, kb, m: (sb, 0)),
        scratch_shapes=[
            pltpu.VMEM((HTp, 1), jnp.float32),
            pltpu.VMEM((HTp, 1), jnp.float32),
            pltpu.VMEM((HTp, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flat_int4_kernel, block=BLK, n_q=T, g=G, scale=scale, dtype=q.dtype,
        q8=q8)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seq * HTp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # 32k-row key blocks overflow the default 16 MB scoped-vmem
            # budget by <1 MB; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(meta, q2, row_head.astype(jnp.int32)[:, None],
      k_flat_q, k_flat_s.astype(jnp.float32)[:, None],
      k_flat_z.astype(jnp.float32)[:, None],
      v_flat_q, v_flat_s.astype(jnp.float32)[:, None],
      v_flat_z.astype(jnp.float32)[:, None], k_tail, v_tail)

    out = out.reshape(n_seq, HTp, D)[:, :HT]
    return out.reshape(H_all, T, D).transpose(1, 0, 2)


@functools.partial(
    jax.jit, static_argnames=("scale", "block", "interpret", "n_seq"))
def flat_decode_attend(
    q: jax.Array,          # (T, H, D), T <= ~64
    k_flat: jax.Array,     # ([L,] D, R_pad) — TRANSPOSED
    v_flat: jax.Array,     # ([L,] R_pad, D)
    row_head: jax.Array,   # ([L,] R_pad) int32, -1 on padding
    k_tail: jax.Array,     # (Hkv, T_cap, D) — includes this block's appended rows
    v_tail: jax.Array,
    tail_len: jax.Array,   # () int32 — tail rows before this block's append
    *,
    scale: float,
    block: int = 8192,
    interpret: bool = False,
    n_seq: int = 1,
    layer: jax.Array = None,  # () int32 — REQUIRED with stacked (L, ...) args
) -> jax.Array:
    """See :func:`flat_decode_attend_int4` for the stacked-``layer`` calling
    convention (avoids the per-layer dynamic-slice copy under scan) and the
    ``n_seq`` merged-batch convention."""
    T, H_all, D = q.shape
    Hkv_all, Tcap, _ = k_tail.shape
    H = H_all // n_seq
    Hkv = Hkv_all // n_seq
    G = H // Hkv
    if layer is None:
        k_flat, v_flat, row_head = k_flat[None], v_flat[None], row_head[None]
        layer = jnp.zeros((), jnp.int32)
    R = k_flat.shape[2] // n_seq
    HT = H * T
    HTp = -(-HT // 8) * 8 if n_seq > 1 else HT
    BLK = _pick_block(R, block, HTp)
    nb = R // BLK

    # q rows ordered head-major: r = h * T + i (seq-major first if merged)
    q2 = q.transpose(1, 0, 2).reshape(n_seq, HT, D)
    if HTp != HT:
        q2 = jnp.pad(q2, ((0, 0), (0, HTp - HT), (0, 0)))
    q2 = q2.reshape(n_seq * HTp, D)
    tl = tail_len.astype(jnp.int32)
    tl = jnp.broadcast_to(tl, (Hkv_all,)) if tl.ndim == 0 else tl
    meta = jnp.concatenate([layer.astype(jnp.int32)[None], tl])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seq, nb),
        in_specs=[
            pl.BlockSpec((HTp, D), lambda sb, kb, m: (sb, 0)),
            pl.BlockSpec((1, 1, BLK), lambda sb, kb, m: (m[0], 0,
                                                         sb * nb + kb)),
            pl.BlockSpec((1, D, BLK), lambda sb, kb, m: (m[0], 0,
                                                         sb * nb + kb)),
            pl.BlockSpec((1, BLK, D), lambda sb, kb, m: (m[0],
                                                         sb * nb + kb, 0)),
            pl.BlockSpec((Hkv, Tcap, D), lambda sb, kb, m: (sb, 0, 0)),
            pl.BlockSpec((Hkv, Tcap, D), lambda sb, kb, m: (sb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((HTp, D), lambda sb, kb, m: (sb, 0)),
        scratch_shapes=[
            pltpu.VMEM((HTp, 1), jnp.float32),
            pltpu.VMEM((HTp, 1), jnp.float32),
            pltpu.VMEM((HTp, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flat_kernel, block=BLK, n_q=T, g=G, scale=scale, dtype=q.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_seq * HTp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(meta, q2, row_head.astype(jnp.int32)[:, None], k_flat, v_flat,
      k_tail, v_tail)

    out = out.reshape(n_seq, HTp, D)[:, :HT]
    return out.reshape(H_all, T, D).transpose(1, 0, 2)
