"""Attention over the fixed-capacity KV cache (jnp backends).

These are the portable/XLA implementations; the Pallas kernels in
``kvzip_tpu.ops.flash`` / ``ragged_decode`` replace them on TPU for long
sequences. Semantics cover every path of the reference attention forwards
(`/root/reference/attention/attn.py:19-96`):

- dense causal prefill attention,
- retain-path masked attention (boolean ``valid`` → -inf, reference
  `kvcache.py:312-347` + flash_attn_varlen),
- ragged per-head decode over compacted caches (reference
  `kvcache.py:187-213` packs each kv head as its own varlen sequence; here
  per-head lengths mask the shared capacity buffer).

Masking rule used everywhere: key row ``j`` of head ``h`` is attendable by
query ``i`` (0-based within the new block) iff ``j < base_len[h] + i + 1`` and
``valid[h, j]`` — this single formula covers uniform prefill, masked retain
decode, and post-compaction ragged decode (new rows are appended at
``base_len[h]``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def attend_dense(
    q: jax.Array,               # (T, H, D)
    k_cache: jax.Array,         # (H_kv, C, D)
    v_cache: jax.Array,         # (H_kv, C, D)
    base_lens: jax.Array,       # (H_kv,) int32 — lengths before this block's append
    valid: Optional[jax.Array],  # (H_kv, C) bool or None
    *,
    scale: float,
    q_pos0: Optional[jax.Array] = None,  # () int32 — global position of query 0
    window: Optional[int] = None,        # sliding-window size (gemma3 local layers)
) -> jax.Array:
    """Reference jnp attention; returns (T, H, D). fp32 softmax."""
    T, H, D = q.shape
    Hkv, C, _ = k_cache.shape
    G = H // Hkv

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)
    scores = jnp.einsum("hgtd,hcd->hgtc", qg.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, C), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, C), 1)
    mask = col < (base_lens[:, None, None] + row + 1)
    if valid is not None:
        mask = mask & valid[:, None, :]
    if window is not None and q_pos0 is not None:
        # cache row j has global position j in the uniform (never-compacted)
        # phase; sliding layers are retain-only so this always holds for them
        q_pos = q_pos0 + row
        mask = mask & (col > q_pos - window)

    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgtc,hcd->hgtd", probs, v_cache.astype(jnp.float32))
    return out.transpose(2, 0, 1, 3).reshape(T, H, D).astype(q.dtype)


def attend_blockwise(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    base_lens: jax.Array,
    valid: Optional[jax.Array],
    *,
    scale: float,
    q_pos0: Optional[jax.Array] = None,
    window: Optional[int] = None,
    kv_block: int = 1024,
) -> jax.Array:
    """Online-softmax attention scanned over KV blocks (flash-style in XLA).

    Never materializes (T, C) probabilities — memory is O(T * kv_block). Works
    on any backend; the Pallas kernel supersedes it on TPU.
    """
    T, H, D = q.shape
    Hkv, C, _ = k_cache.shape
    G = H // Hkv
    kv_block = min(kv_block, C)
    while C % kv_block:
        kv_block //= 2
    nblocks = C // kv_block

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3).astype(jnp.float32)  # (Hkv,G,T,D)
    kb = k_cache.reshape(Hkv, nblocks, kv_block, D)
    vb = v_cache.reshape(Hkv, nblocks, kv_block, D)
    validb = None if valid is None else valid.reshape(Hkv, nblocks, kv_block)

    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, kv_block), 1)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, kv_block), 2)

    def body(carry, xs):
        m, l, acc = carry  # (Hkv,G,T,1), (Hkv,G,T,1), (Hkv,G,T,D)
        k_blk, v_blk, vmask_blk, blk_idx = xs
        col = col_local + blk_idx * kv_block
        mask = col < (base_lens[:, None, None] + row + 1)
        if vmask_blk is not None:
            mask = mask & vmask_blk[:, None, :]
        if window is not None and q_pos0 is not None:
            mask = mask & (col > (q_pos0 + row) - window)

        s = jnp.einsum("hgtd,hcd->hgtc", qg, k_blk.astype(jnp.float32)) * scale
        s = jnp.where(mask[:, None, :, :], s, NEG_INF)

        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked state: exp(-inf - -inf) -> use where
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("hgtc,hcd->hgtd", p, v_blk.astype(jnp.float32))
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((Hkv, G, T, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hkv, G, T, 1), jnp.float32)
    acc0 = jnp.zeros((Hkv, G, T, D), jnp.float32)

    xs = (jnp.swapaxes(kb, 0, 1), jnp.swapaxes(vb, 0, 1),
          None if validb is None else jnp.swapaxes(validb, 0, 1),
          jnp.arange(nblocks))
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)

    out = acc / jnp.maximum(l, 1e-37)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D).astype(q.dtype)


def attend_ring(
    q: jax.Array,          # (T, H, D) queries at positions [seen, seen+T)
    k_ring: jax.Array,     # (H_kv, W, D) PRE-append ring (positions < seen)
    v_ring: jax.Array,
    ring_pos: jax.Array,   # (W,) int32 token position per slot, -1 empty
    k_new: jax.Array,      # (T, H_kv, D) this chunk's keys
    v_new: jax.Array,
    seen,
    *,
    scale: float,
    window: int,
    kv_block: int = 1024,
) -> jax.Array:
    """Sliding-window attention over a position-stamped ring buffer.

    The kv set for query i (position p_i = seen + i) is every column with
    position in (p_i - window, p_i]: the current chunk supplies positions
    [seen, seen+T) and the ring supplies the preceding window. Must see the
    PRE-append ring — appending first would evict rows that early queries
    still need when T ~ window (the reference attends over full current
    keys and only stores the truncated window, `_sliding_update`,
    `attention/kvcache.py:402-447`).
    """
    T, H, D = q.shape
    Hkv, W, _ = k_ring.shape
    G = H // Hkv

    keys = jnp.concatenate([jnp.swapaxes(k_new, 0, 1), k_ring], axis=1)
    vals = jnp.concatenate([jnp.swapaxes(v_new, 0, 1), v_ring], axis=1)
    pos_cols = jnp.concatenate(
        [seen + jnp.arange(T, dtype=jnp.int32), ring_pos.astype(jnp.int32)])

    C = T + W
    blk = min(kv_block, C)
    pad = (-C) % blk
    if pad:
        keys = jnp.pad(keys, ((0, 0), (0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
        pos_cols = jnp.pad(pos_cols, (0, pad), constant_values=-1)
        C += pad
    nblocks = C // blk

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3).astype(jnp.float32)
    q_pos = seen + jnp.arange(T, dtype=jnp.int32)[:, None]      # (T, 1)

    def body(carry, xs):
        m, l, acc = carry
        k_blk, v_blk, p_blk = xs                                 # (Hkv,blk,D)
        ok = (p_blk[None, :] >= 0) & (p_blk[None, :] <= q_pos) \
            & (p_blk[None, :] > q_pos - window)                  # (T, blk)
        s = jnp.einsum("hgtd,hcd->hgtc", qg,
                       k_blk.astype(jnp.float32)) * scale
        s = jnp.where(ok[None, None], s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "hgtc,hcd->hgtd", p, v_blk.astype(jnp.float32))
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((Hkv, G, T, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hkv, G, T, 1), jnp.float32)
    acc0 = jnp.zeros((Hkv, G, T, D), jnp.float32)
    xs = (jnp.swapaxes(keys.reshape(Hkv, nblocks, blk, D), 0, 1),
          jnp.swapaxes(vals.reshape(Hkv, nblocks, blk, D), 0, 1),
          pos_cols.reshape(nblocks, blk))
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)

    out = acc / jnp.maximum(l, 1e-37)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D).astype(q.dtype)


def attend_blockwise_int4(
    q: jax.Array,                    # (T, H, D)
    kq: jax.Array, ks: jax.Array, kz: jax.Array,   # packed K + scales/zeros
    vq: jax.Array, vs: jax.Array, vz: jax.Array,   # packed V + scales/zeros
    base_lens: jax.Array,
    valid: Optional[jax.Array],
    *,
    scale: float,
    q_pos0: Optional[jax.Array] = None,
    window: Optional[int] = None,
    kv_block: int = 512,
) -> jax.Array:
    """Online-softmax attention over the INT4 cache, dequantizing per block.

    HBM reads stay at the int4 footprint; only one (kv_block, D) tile is ever
    dequantized at a time (contrast reference `int4_kv.py:242-267` which
    dequantizes the WHOLE cache to fp16 before every attention call).
    """
    from kvzip_tpu.ops.quant import dequantize_int4

    T, H, D = q.shape
    Hkv, C = kq.shape[0], kq.shape[1]
    G = H // Hkv
    kv_block = min(kv_block, C)
    while C % kv_block:
        kv_block //= 2
    nblocks = C // kv_block

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, kv_block), 1)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (Hkv, T, kv_block), 2)

    def reshape_blocks(a):
        return jnp.swapaxes(a.reshape(Hkv, nblocks, kv_block, *a.shape[2:]), 0, 1)

    xs = tuple(reshape_blocks(a) for a in (kq, ks, kz, vq, vs, vz))
    validb = None if valid is None else jnp.swapaxes(
        valid.reshape(Hkv, nblocks, kv_block), 0, 1)

    def body(carry, inp):
        m, l, acc = carry
        (kq_b, ks_b, kz_b, vq_b, vs_b, vz_b), vmask_b, blk_idx = inp
        k_blk = dequantize_int4(kq_b, ks_b, kz_b, jnp.float32, pack="split")
        v_blk = dequantize_int4(vq_b, vs_b, vz_b, jnp.float32, pack="split")

        col = col_local + blk_idx * kv_block
        mask = col < (base_lens[:, None, None] + row + 1)
        if vmask_b is not None:
            mask = mask & vmask_b[:, None, :]
        if window is not None and q_pos0 is not None:
            mask = mask & (col > (q_pos0 + row) - window)

        s = jnp.einsum("hgtd,hcd->hgtc", qg, k_blk) * scale
        s = jnp.where(mask[:, None, :, :], s, NEG_INF)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new), 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("hgtc,hcd->hgtd", p, v_blk)
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((Hkv, G, T, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Hkv, G, T, 1), jnp.float32)
    acc0 = jnp.zeros((Hkv, G, T, D), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, acc0), (xs, validb, jnp.arange(nblocks)))

    out = acc / jnp.maximum(l, 1e-37)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D).astype(q.dtype)


def reconstruction_scores(
    q: jax.Array,          # (T, H, D) — queries of the repeat pass (post-rope)
    k_sink: jax.Array,     # (H_kv, S_sink, D) — sink keys (system prompt)
    k_ctx: jax.Array,      # (H_kv, S_ctx, D) — context window chunk (padded)
    k_rep: jax.Array,      # (T, H_kv, D) — keys of the repeat window itself
    ctx_len: jax.Array,    # () int32 — true chunk length (<= S_ctx)
    *,
    scale: float,
    q_valid: Optional[jax.Array] = None,  # () int32 — true #queries (<= T)
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """KVzip importance scores for one layer & one scoring chunk.

    Exact semantics of reference ``KVScore._get_score``
    (`attention/score.py:36-65`): softmax over the concatenated
    [sink ∥ ctx chunk ∥ repeat window] keys (NOT the full cache), causal mask
    only on the trailing T×T block, logits quantized to model dtype before the
    softmax (the reference softmaxes bf16 tensors), then
    ``amax`` over (group, query) of the ctx columns → (H_kv, S_ctx).

    Padding columns of k_ctx beyond ``ctx_len`` are masked out.
    """
    T, H, D = q.shape
    Hkv = k_sink.shape[0]
    G = H // Hkv
    S_sink, S_ctx = k_sink.shape[1], k_ctx.shape[1]

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)
    keys = jnp.concatenate(
        [k_sink, k_ctx, jnp.swapaxes(k_rep, 0, 1)], axis=1)  # (Hkv, S_sink+S_ctx+T, D)

    logits = jnp.einsum("hgtd,hkd->hgtk", qg.astype(jnp.float32),
                        keys.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale

    K = S_sink + S_ctx + T
    col = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, K), 0)
    # causal on the trailing T x T block only (score.py:67-85)
    causal_bad = (col >= S_sink + S_ctx) & (col - (S_sink + S_ctx) > row)
    # mask padded ctx columns (ctx chunk shorter than the static window)
    pad_bad = (col >= S_sink + ctx_len) & (col < S_sink + S_ctx)
    bad = causal_bad | pad_bad

    logits = jnp.where(bad[None, None, :, :], NEG_INF, logits)
    # parity: reference computes softmax on model-dtype (bf16) logits
    logits = logits.astype(out_dtype).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)

    ctx_probs = jax.lax.dynamic_slice_in_dim(probs, S_sink, S_ctx, axis=-1)
    if q_valid is not None:
        # exclude padded queries from the amax (the engine pads the repeat
        # pass to a fixed shape so every scoring chunk shares one compile)
        qrow = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        ctx_probs = jnp.where(qrow[None, None] < q_valid, ctx_probs, 0.0)
    score = ctx_probs.max(axis=(1, 2))  # amax over (group, query) -> (Hkv, S_ctx)
    return score.astype(out_dtype)


def windowed_scoring_attend(
    q: jax.Array,          # (T, H, D) — repeat-pass queries (post-rope)
    k_sink: jax.Array,     # (H_kv, S_sink, D)
    k_ctx: jax.Array,      # (H_kv, S_ctx, D) — scored window chunk (padded)
    k_rep: jax.Array,      # (T, H_kv, D) — repeat window's own keys
    v_sink: jax.Array,
    v_ctx: jax.Array,
    v_rep: jax.Array,
    ctx_len: jax.Array,    # () int32 — true chunk length (<= S_ctx)
    *,
    scale: float,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Attention OUTPUT of the scoring pass in WINDOWED mode: queries attend
    only [sink ∥ scored window ∥ repeat] instead of the full cache.

    This makes reconstruction scoring O(ctx · window) instead of O(ctx²) —
    the exact-parity scoring forward runs a normal model forward over the
    whole cache (reference `model/wrapper.py:223-249`), whose attention
    FLOPs are intrinsically 2× the prefill's. Windowed mode is an OPT-IN
    approximation (`Engine(scoring_attend="window")`): repeat queries see
    less context, so hidden states — and therefore scores — deviate from
    the reference except when one window covers the entire context (then
    the key set is identical and so is everything downstream; tested).
    Masking matches :func:`reconstruction_scores`: padded window columns
    dropped, causal only on the trailing T×T block.

    Padded QUERY rows (``q`` rows beyond the true repeat length) are
    deliberately left unmasked, unlike ``reconstruction_scores``'s
    ``q_valid`` handling: their outputs are attention over real keys and
    therefore finite, and the engine discards those rows' hidden states
    (the scoring pass restores the cache snapshot and only
    ``chunk_scores`` — which IS q_valid-masked — leaves the forward). Any
    future consumer of the full windowed attention output must mask rows
    ``>= q_valid`` itself (ADVICE r4).
    """
    T, H, D = q.shape
    Hkv = k_sink.shape[0]
    G = H // Hkv
    S_sink, S_ctx = k_sink.shape[1], k_ctx.shape[1]

    qg = q.reshape(T, Hkv, G, D).transpose(1, 2, 0, 3)  # (Hkv, G, T, D)
    keys = jnp.concatenate(
        [k_sink, k_ctx, jnp.swapaxes(k_rep, 0, 1)], axis=1)
    vals = jnp.concatenate(
        [v_sink, v_ctx, jnp.swapaxes(v_rep, 0, 1)], axis=1)

    logits = jnp.einsum("hgtd,hkd->hgtk", qg.astype(jnp.float32),
                        keys.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    K = S_sink + S_ctx + T
    col = jax.lax.broadcasted_iota(jnp.int32, (T, K), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, K), 0)
    causal_bad = (col >= S_sink + S_ctx) & (col - (S_sink + S_ctx) > row)
    pad_bad = (col >= S_sink + ctx_len) & (col < S_sink + S_ctx)
    logits = jnp.where((causal_bad | pad_bad)[None, None], NEG_INF, logits)
    # f32 softmax — this is the model's attention (the flash kernels run an
    # f32 online softmax), NOT the score hook's deliberate bf16 round-trip
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hgtk,hkd->hgtd", probs, vals.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.transpose(2, 0, 1, 3).reshape(T, H, D).astype(out_dtype)
