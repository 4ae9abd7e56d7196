"""Per-layer fused W4A8 decode megakernel: ONE Pallas launch per layer for
everything between two attentions.

Measured on chip (tools/probe_w4a8_v2.py): the v2 column-blocked kernels
stream weights at ~691 GB/s marginal, but a 28-layer decode step still pays
~17 us of fixed cost per launch (pipeline fill/drain + dispatch) x 112
launches plus the inter-launch XLA glue. This kernel collapses the four
linear launches per layer into one:

    phase O    o-proj of the (pre-quantized in-prologue) attention output,
               accumulated into the residual row held in VMEM
    phase GU   RMSNorm + act-quant of the updated residual (in-kernel),
               gate/up matmul; SiLU(gate)*up lands in a VMEM scratch as
               each column block completes (the fused gate|up split-packing
               puts gate in the hi nibbles and up in the lo nibbles of the
               SAME byte column — the silu-mul is block-local)
    phase DN   per-row quant of the hidden scratch, down matmul,
               residual add; emits the new residual row AND the NEXT
               layer's RMSNorm + act-quant
    phase QKV  next layer's qkv matmul (weights prefetched during earlier
               phases by the parked index maps)

so a decode step runs 2 launches/layer (this + pool attention) instead of
5, with zero XLA glue between the linears. Weight storage is the v2 layout
(`ops/w4a8_v2.py`). Residual adds / norm inputs round through bf16 at the
same points as the composed path, so results match the per-launch kernels
to bf16 rounding (tests/test_w4a8_fused.py).

Reference frame: this subsumes QServe's fused RMSNormGeneral +
SiluAndMulQuant + W8A8 GEMM family (`model/quant_model/w8a8kv4_llama.py:
126-163,165-321`) in one kernel, at half the weight bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kvzip_tpu.ops.w4a8 import GROUP

GPB = 8  # groups per reduction step (measured best, probe_w4a8_mat)


def _geom(w):
    """(ngb, half, Gp) for one v2 weight stack."""
    L, rows, half = w["q4"].shape
    Gp = w["s2"].shape[2]
    assert Gp % GPB == 0, (Gp, GPB)
    return Gp // GPB, half, Gp


def _hb(half, nob):
    assert half % nob == 0 or nob == 1
    return -(-half // nob)


def _layer_kernel(m_ref, x_ref, attn_ref, lnm_ref, lna_ref,
                  oq_ref, osh_ref, osl_ref, ozh_ref, ozl_ref,
                  gq_ref, gsh_ref, gsl_ref, gzh_ref, gzl_ref,
                  dq_ref, dsh_ref, dsl_ref, dzh_ref, dzl_ref,
                  kq_ref, ksh_ref, ksl_ref, kzh_ref, kzl_ref,
                  xnew_ref, qhi_ref, qlo_ref,
                  xq_scr, xs_scr, xrow_scr, h_scr, hmax_scr, ahi_scr,
                  alo_scr,
                  *, phases, eps: float, dtype):
    i = pl.program_id(0)
    BT = x_ref.shape[0]
    D = x_ref.shape[1]
    (o0, o_ngb, o_hb), (g0, g_ngb, g_nob, g_hb), (d0, d_ngb, d_hb), \
        (q0, q_ngb, q_hb) = phases
    I2 = g_nob * g_hb  # intermediate size (gate cols = hi half)

    f32 = jnp.float32

    def rnd(v):  # match the composed path's bf16 rounding points
        return v.astype(dtype).astype(f32)

    GB_LANES = GPB * GROUP

    def quant_to(xn, scale=None):
        """Per-row symmetric s8 quant of xn (BT, n) into the block-major
        activation scratch (dynamic LANE slicing of a flat scratch is a
        Mosaic data-movement slow path; the (nb, BT, 1024) layout makes
        the per-step read a leading-axis address offset)."""
        n = xn.shape[1]
        s = scale if scale is not None else (
            jnp.max(jnp.abs(xn), axis=1, keepdims=True) / 127.0 + 1e-20)
        nb = -(-n // GB_LANES)
        if nb * GB_LANES != n:
            xn = jnp.pad(xn, ((0, 0), (0, nb * GB_LANES - n)))
        q = jnp.round(xn * (1.0 / s)).astype(jnp.int8)
        for b in range(nb):
            xq_scr[b] = q[:, b * GB_LANES:(b + 1) * GB_LANES]
        xs_scr[...] = s.astype(f32)

    def norm_quant(xr, w_ref):
        xf = xr  # f32
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        xn = rnd(xf * jax.lax.rsqrt(var + eps)
                 * w_ref[0, 0].astype(f32))
        quant_to(xn)

    @pl.when(i == 0)
    def _():
        xrow_scr[...] = x_ref[...].astype(f32)
        h_scr[...] = jnp.zeros_like(h_scr)
        hmax_scr[...] = jnp.zeros_like(hmax_scr)
        aq = attn_ref[...].astype(f32)
        quant_to(aq)

    def matmul_block(wq_ref, sh_ref, sl_ref, zh_ref, zl_ref, gb, ngb, hb,
                     ob=0):
        """One (GPB-group x hb-column) reduction step into ahi/alo scratch
        slices, reading activations from xq_scr."""
        wb = wq_ref[0]
        b8 = jax.lax.bitcast_convert_type(wb, jnp.int8)
        lo8 = jax.lax.bitcast_convert_type(wb & 0xF, jnp.int8)

        # carry-in via select (a predicated zeroing region costs a scalar
        # branch per step; the select is branch-free VPU work)
        prev_hi = jnp.where(gb == 0, 0.0, ahi_scr[:, :hb])
        prev_lo = jnp.where(gb == 0, 0.0, alo_scr[:, :hb])

        xg_all = xq_scr[gb]
        xsums = jnp.sum(xg_all.reshape(BT, GPB, GROUP).astype(f32), axis=2)
        acc_hi = jax.lax.dot_general(
            xsums, zh_ref[0, 0].astype(f32), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        acc_lo = jax.lax.dot_general(
            xsums, zl_ref[0, 0].astype(f32), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        for g in range(GPB):
            sl = slice(g * GROUP, (g + 1) * GROUP)
            xg = xg_all[:, sl]
            m1 = jax.lax.dot_general(xg, b8[sl], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            m2 = jax.lax.dot_general(xg, lo8[sl], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            acc_hi += (m1 - m2).astype(f32) * sh_ref[0, 0, g].astype(f32)
            acc_lo += m2.astype(f32) * sl_ref[0, 0, g].astype(f32)
        ahi_scr[:, :hb] = prev_hi + acc_hi
        alo_scr[:, :hb] = prev_lo + acc_lo

    # ------------------------------------------------------------- phase O
    @pl.when(i < g0)
    def _():
        gb = i - o0
        matmul_block(oq_ref, osh_ref, osl_ref, ozh_ref, ozl_ref,
                     gb, o_ngb, o_hb)

        @pl.when(gb == o_ngb - 1)
        def _():
            xs = xs_scr[...]
            xr = xrow_scr[...]
            add = jnp.concatenate(
                [ahi_scr[:, :o_hb] * xs, alo_scr[:, :o_hb] * xs], axis=1)
            xr = rnd(xr + rnd(add))
            xrow_scr[...] = xr
            norm_quant(xr, lnm_ref)

    # ------------------------------------------------------------ phase GU
    @pl.when((i >= g0) & (i < d0))
    def _():
        j = i - g0
        ob = j // g_ngb
        gb = j % g_ngb
        matmul_block(gq_ref, gsh_ref, gsl_ref, gzh_ref, gzl_ref,
                     gb, g_ngb, g_hb)

        @pl.when(gb == g_ngb - 1)
        def _():
            xs = xs_scr[...]
            gate = rnd(ahi_scr[:, :g_hb] * xs)
            up = rnd(alo_scr[:, :g_hb] * xs)
            h = rnd(gate * jax.lax.logistic(gate) * up)
            h_scr[:, pl.ds(ob * g_hb, g_hb)] = h
            hmax_scr[...] = jnp.maximum(
                hmax_scr[...], jnp.max(jnp.abs(h), axis=1, keepdims=True))

    # ------------------------------------------------------------ phase DN
    @pl.when((i >= d0) & (i < q0))
    def _():
        gb = i - d0

        @pl.when(gb == 0)
        def _():
            quant_to(h_scr[...],
                     scale=hmax_scr[...] / 127.0 + 1e-20)

        matmul_block(dq_ref, dsh_ref, dsl_ref, dzh_ref, dzl_ref,
                     gb, d_ngb, d_hb)

        @pl.when(gb == d_ngb - 1)
        def _():
            xs = xs_scr[...]
            add = jnp.concatenate(
                [ahi_scr[:, :d_hb] * xs, alo_scr[:, :d_hb] * xs], axis=1)
            xr = rnd(xrow_scr[...] + rnd(add))
            xnew_ref[...] = xr.astype(dtype)
            norm_quant(xr, lna_ref)

    # ----------------------------------------------------------- phase QKV
    @pl.when(i >= q0)
    def _():
        gb = i - q0
        matmul_block(kq_ref, ksh_ref, ksl_ref, kzh_ref, kzl_ref,
                     gb, q_ngb, q_hb)

        @pl.when(gb == q_ngb - 1)
        def _():
            xs = xs_scr[...]
            qhi_ref[...] = (ahi_scr[:, :q_hb] * xs).astype(dtype)
            qlo_ref[...] = (alo_scr[:, :q_hb] * xs).astype(dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "g_hb_target"))
def w4a8_layer_fused(x: jax.Array, attn_out: jax.Array,
                     ln_mlp: jax.Array, ln_attn: jax.Array,
                     w_o: dict, w_gu: dict, w_dn: dict, w_qkv: dict,
                     layer: jax.Array, *, eps: float,
                     interpret: bool = False, g_hb_target: int = 4736):
    """(x_new, qkv) for layer ``layer``: o-proj + residual + MLP + residual
    + NEXT layer's norm+qkv, one Pallas launch.

    x (T, D), attn_out (T, H*Dh); ln_mlp/ln_attn (L, 1, D) stacks (ln_attn
    indexed at layer+1, clamped — the last layer's qkv output is unused);
    weights in v2 stacked storage. T must be <= 8 (decode shapes)."""
    T, D = x.shape
    assert T <= 8, "megakernel is a decode-shape kernel"
    BT = 8
    L = ln_mlp.shape[0]

    o_ngb, o_half, _ = _geom(w_o)
    g_ngb, g_half, _ = _geom(w_gu)
    d_ngb, d_half, _ = _geom(w_dn)
    q_ngb, q_half, _ = _geom(w_qkv)
    assert o_half * 2 == D and d_half * 2 == D
    g_nob = max(1, round(g_half / g_hb_target))
    while g_half % g_nob:
        g_nob -= 1
    g_hb = g_half // g_nob

    o0 = 0
    g0 = o0 + o_ngb
    d0 = g0 + g_nob * g_ngb
    q0 = d0 + d_ngb
    n_steps = q0 + q_ngb
    phases = ((o0, o_ngb, o_half), (g0, g_ngb, g_nob, g_hb),
              (d0, d_ngb, d_half), (q0, q_ngb, q_half))

    hbmax = max(o_half, g_hb, d_half, q_half)
    in_lanes = max(a["q4"].shape[1] for a in (w_o, w_gu, w_dn, w_qkv))
    scr_lanes = max(w_dn["s2"].shape[2] * GROUP,
                    -(-in_lanes // (GPB * GROUP)) * GPB * GROUP)

    if T < BT:
        x = jnp.pad(x, ((0, BT - T), (0, 0)))
        attn_out = jnp.pad(attn_out, ((0, BT - T), (0, 0)))

    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    def wmaps(start, ngb, nob, hb):
        """(q4 map, scale hi map, scale lo map) with pre-phase parking at
        block 0 (free prefetch) and post-phase parking at the last block."""
        def q4m(i, m):
            j = jnp.clip(i - start, 0, ngb * nob - 1)
            return (m[0], j % ngb, j // ngb)

        def sm(cc):
            def f(i, m):
                j = jnp.clip(i - start, 0, ngb * nob - 1)
                return (m[0], cc, j % ngb, j // ngb)
            return f
        return q4m, sm(0), sm(1)

    def nxt(i, m):
        del i
        return (jnp.minimum(m[0] + 1, L - 1), 0, 0)

    oq, osh, osl = wmaps(o0, o_ngb, 1, o_half)
    gq, gsh, gsl = wmaps(g0, g_ngb, g_nob, g_hb)
    dq, dsh, dsl = wmaps(d0, d_ngb, 1, d_half)
    kq, ksh, ksl = wmaps(q0, q_ngb, 1, q_half)

    def wspecs(w, ngb, hb, q4m, shm, slm):
        return [
            pl.BlockSpec((1, GPB * GROUP, hb), q4m),
            pl.BlockSpec((1, 1, GPB, hb), shm),
            pl.BlockSpec((1, 1, GPB, hb), slm),
            pl.BlockSpec((1, 1, GPB, hb), shm),
            pl.BlockSpec((1, 1, GPB, hb), slm),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((BT, D), lambda i, m: (0, 0)),
            pl.BlockSpec((BT, attn_out.shape[1]), lambda i, m: (0, 0)),
            pl.BlockSpec((1, 1, D), lambda i, m: (m[0], 0, 0)),
            pl.BlockSpec((1, 1, D), nxt),
            *wspecs(w_o, o_ngb, o_half, oq, osh, osl),
            *wspecs(w_gu, g_ngb, g_hb, gq, gsh, gsl),
            *wspecs(w_dn, d_ngb, d_half, dq, dsh, dsl),
            *wspecs(w_qkv, q_ngb, q_half, kq, ksh, ksl),
        ],
        out_specs=[
            pl.BlockSpec((BT, D), lambda i, m: (0, 0)),
            pl.BlockSpec((BT, q_half), lambda i, m: (0, 0)),
            pl.BlockSpec((BT, q_half), lambda i, m: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((scr_lanes // (GPB * GROUP), BT, GPB * GROUP),
                       jnp.int8),                    # xq, block-major
            pltpu.VMEM((BT, 1), jnp.float32),        # xs
            pltpu.VMEM((BT, D), jnp.float32),        # residual row
            pltpu.VMEM((BT, g_half), jnp.float32),   # silu(gate)*up
            pltpu.VMEM((BT, 1), jnp.float32),        # h row max
            pltpu.VMEM((BT, hbmax), jnp.float32),    # acc hi
            pltpu.VMEM((BT, hbmax), jnp.float32),    # acc lo
        ],
    )

    kernel = functools.partial(
        _layer_kernel, phases=phases, eps=eps, dtype=x.dtype)
    xnew, qhi, qlo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((BT, D), x.dtype),
                   jax.ShapeDtypeStruct((BT, q_half), x.dtype),
                   jax.ShapeDtypeStruct((BT, q_half), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lidx, x, attn_out, ln_mlp, ln_attn,
      w_o["q4"], w_o["s2"], w_o["s2"], w_o["z2"], w_o["z2"],
      w_gu["q4"], w_gu["s2"], w_gu["s2"], w_gu["z2"], w_gu["z2"],
      w_dn["q4"], w_dn["s2"], w_dn["s2"], w_dn["z2"], w_dn["z2"],
      w_qkv["q4"], w_qkv["s2"], w_qkv["s2"], w_qkv["z2"], w_qkv["z2"])
    qkv = jnp.concatenate([qhi, qlo], axis=1)
    return xnew[:T], qkv[:T]
