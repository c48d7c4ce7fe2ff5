"""Multi-head attention with SpeechT5 relative-position bias and functional KV cache.

Behavioral spec from reference modules/multihead_attention.py:24-522:
- scaled dot-product attention, q scaled by head_dim**-0.5 before use;
- relative position bias is a *first-order* term added to the logits:
  B[b,h,i,j] = q_scaled[b,h,i,:] . pe_k[clip(i-j)][:]  (reference :343-353),
  where pe_k is a (2*max_dist, head_dim) embedding shared across heads/layers;
- KV cache for incremental decoding (reference :269-307), static for cross-attn.

TPU-native departures: batch-major [B, T, D] layout; the bias is computed as one
einsum against the (small) pe_k table followed by a relative-index gather instead
of materializing the [T, T, head_dim] position tensor; softmax in f32; the cache
is an explicit pytree (no module state) so decode loops run inside lax.scan /
while_loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = -1e9


def rel_position_index(q_pos, k_pos, max_dist: int):
    """clip(i - j, -max_dist, max_dist - 1) + max_dist -> index into the pe table."""
    rel = q_pos[..., :, None] - k_pos[..., None, :]
    return jnp.clip(rel, -max_dist, max_dist - 1) + max_dist


def _skew_band(scores_r, T: int, max_dist: int):
    """Realize B[..., i, j] = S[..., i, clip(i-j+M, 0, 2M-1)] from
    S = scores_r [..., T, 2M] with pad+reshape only (no gather).

    Gather-free matters: XLA:TPU lowering of a [B,H,T,T] take_along_axis over
    the last axis took ~440s to compile PER LAYER; this skew compiles in
    seconds and adds zero FLOPs.
    """
    M = max_dist
    R = 2 * M
    s_rev = scores_r[..., ::-1]                      # col r' = j - i + (M-1)
    W = R + T
    p = jnp.pad(s_rev, [(0, 0)] * (s_rev.ndim - 1) + [(0, T)])
    flat = p.reshape(p.shape[:-2] + (T * W,))
    p2 = flat[..., : T * (W - 1)].reshape(p.shape[:-2] + (T, W - 1))
    band = p2[..., M - 1 : M - 1 + T]                # [..., T, T]

    # edge clamping: col = j - i + (M-1); col<=0 -> last rel column (most past),
    # col>=R-1 -> first rel column (most future)
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    col = j - i + (M - 1)
    past = scores_r[..., -1:]                        # [..., T, 1]
    future = scores_r[..., :1]
    out = jnp.where(col <= 0, past, band)
    out = jnp.where(col >= R - 1, future, out)
    return out


def band_from_table(pos_table, T: int, max_dist: int):
    """Precompute pe_band[d, i, j] = pos_table[clip(i-j)+M, d] with ONE skew.

    Shared across layers and heads for post-LN stacks (the reference applies
    norm_k to the table only on the pre-LN path, transformer_layer.py:90-93),
    so the per-layer bias becomes a single MXU einsum against this band —
    measurably faster than re-skewing [B, H, T, T] scores in every layer.
    """
    Dh = pos_table.shape[1]
    S = jnp.broadcast_to(pos_table.T[:, None, :], (Dh, T, 2 * max_dist))
    return _skew_band(S, T, max_dist)        # [Dh, T, T]


def relative_bias_banded(q, pos_band):
    """q: [B, Tq, H, Dh] (scaled); pos_band: [Dh, T, T] -> bias [B, H, Tq, Tk]."""
    return jnp.einsum("bqhd,dqk->bhqk", q, pos_band.astype(q.dtype))


def relative_bias(q, pos_table, q_pos, k_pos, max_dist: int):
    """q: [B, Tq, H, Dh] (already scaled); pos_table: [2*max_dist, Dh].

    Returns bias [B, H, Tq, Tk].  Equivalent to the reference's
    q @ pe_k[i-j]^T but as one einsum against the small table followed by a
    gather-free skew (full self-attention) or a tiny gather (decode steps).
    """
    scores_r = jnp.einsum("bqhd,rd->bhqr", q, pos_table.astype(q.dtype))
    Tq, Tk = q_pos.shape[-1], k_pos.shape[-1]
    if Tq == Tk and Tq > 1:
        return _skew_band(scores_r, Tq, max_dist)
    idx = rel_position_index(q_pos, k_pos, max_dist)  # [Tq, Tk]
    idx = jnp.broadcast_to(idx, scores_r.shape[:2] + idx.shape)
    return jnp.take_along_axis(scores_r, idx, axis=-1)


class MultiheadAttention(nn.Module):
    """Projection + attention.  Cache-aware; supports self and cross attention."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False   # fused banded-bias kernel on deterministic
    #                            full self-attention (see config.use_pallas_attn)
    use_pallas_train: bool = False  # differentiable fused kernel (custom VJP,
    #                            in-kernel dropout) on non-deterministic full
    #                            self-attention (config.use_pallas_attn_train)
    scores_f32: bool = True    # materialize attention logits/bias in f32.
    #                            False keeps them in compute dtype (softmax
    #                            still reduces in f32) — halves the [B,H,T,T]
    #                            HBM traffic under bf16; matches the
    #                            reference's fp16 training, which also keeps
    #                            scores in compute dtype (fairseq fp16 path).

    @property
    def head_dim(self):
        return self.d_model // self.num_heads

    def setup(self):
        dense = lambda name: nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    def __call__(
        self,
        x_q,
        x_kv=None,
        *,
        key_valid=None,           # bool [B, Tk] True=attend
        causal: bool = False,
        pos_table=None,           # [2*max_dist, Dh] rel-pos embedding (pre-normed)
        pos_band=None,            # [Dh, T, T] precomputed band (full self-attn)
        max_dist: int = 0,
        cache: Optional[dict] = None,   # {"k","v": [B, Tmax, H, Dh]} self-attn decode
        cache_index=None,         # scalar int: write position for this step
        cache_rows=None,          # int [B, Tmax]: ancestry map for gather-free
        #                           beam reorder — cache_rows[b, j] is the
        #                           physical row whose position-j K/V belong
        #                           to logical row b (cache buffers are never
        #                           permuted; the beam loop shuffles this map
        #                           instead of the buffers)
        cross_kv: Optional[dict] = None,  # precomputed {"k","v"} for cross-attn decode
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        B, Tq, _ = x_q.shape
        H, Dh = self.num_heads, self.head_dim
        scaling = Dh ** -0.5

        q = self.q_proj(x_q).reshape(B, Tq, H, Dh) * scaling

        new_cache = None
        if cross_kv is not None:
            k, v = cross_kv["k"], cross_kv["v"]
            if k.shape[0] != B:
                # grouped cross-attention: beam search tiles each sample's
                # queries G times but the encoder K/V are identical within a
                # group — computing against the UNTILED K/V reads them once
                # per sample instead of once per beam (5x less HBM traffic
                # per decode step at beam 5)
                Bkv = k.shape[0]
                G = B // Bkv
                Tk = k.shape[1]
                q_g = q.reshape(Bkv, G * Tq, H, Dh)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q_g, k).astype(
                    jnp.float32
                )
                if key_valid is not None:
                    kv_mask = key_valid
                    if kv_mask.shape[0] != Bkv:  # caller passed tiled mask
                        kv_mask = kv_mask.reshape(Bkv, G, Tk)[:, 0]
                    logits = jnp.where(
                        kv_mask[:, None, None, :], logits, NEG_INF
                    )
                weights = jax.nn.softmax(logits, axis=-1)
                probs = weights.astype(self.dtype)
                if self.dropout > 0.0 and not deterministic:
                    keep = jax.random.bernoulli(
                        self.make_rng("dropout"), 1.0 - self.dropout,
                        probs.shape,
                    )
                    probs = probs * keep / (1.0 - self.dropout)
                out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype))
                out = out.reshape(B, Tq, self.d_model)
                out = self.out_proj(out)
                w = None
                if return_weights:
                    # grouped weights back to per-row [B, H, Tq, Tk]
                    w = jnp.transpose(
                        weights.reshape(Bkv, H, G, Tq, Tk), (0, 2, 1, 3, 4)
                    ).reshape(B, H, Tq, Tk)
                return out, w, None
        else:
            src = x_q if x_kv is None else x_kv
            k = self.k_proj(src).reshape(B, -1, H, Dh)
            v = self.v_proj(src).reshape(B, -1, H, Dh)
            if cache is not None:
                k = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0)
                )
                new_cache = {"k": k, "v": v}
                if cache_rows is not None:
                    # ancestry-indexed view for attention (the returned cache
                    # stays unpermuted): one flattened leading-axis gather of
                    # (row, position) pairs — contiguous H*Dh blocks
                    Tc = k.shape[1]
                    flat = (
                        cache_rows.astype(jnp.int32) * Tc
                        + jnp.arange(Tc, dtype=jnp.int32)[None, :]
                    ).reshape(-1)
                    k = k.reshape(B * Tc, H, Dh)[flat].reshape(B, Tc, H, Dh)
                    v = v.reshape(B * Tc, H, Dh)[flat].reshape(B, Tc, H, Dh)

        Tk = k.shape[1]

        use_fused = (
            pos_band is not None
            and (self.use_pallas if deterministic else self.use_pallas_train)
            and not return_weights
            and not causal
            and cache is None
            and cross_kv is None
            # VMEM bound: the per-program band block is Dh*64*T_pad*4 bytes;
            # beyond ~1k keys it overflows the ~16MB budget — fall back to XLA
            and Tk <= 1024
        )
        if use_fused:
            # fused kernel: scores + in-kernel banded bias + mask + softmax +
            # (dropout on the train path) + PV in one pass, no [B, H, Tq, Tk]
            # tensors in HBM.  key_valid is a contiguous prefix mask in every
            # data path here (right-padded collation), expressed as per-row
            # lengths.
            from ..ops.pallas_kernels import (
                banded_flash_attention, banded_attention_train,
            )

            N = B * H
            qf = q.transpose(0, 2, 1, 3).reshape(N, Tq, Dh)
            kf = k.transpose(0, 2, 1, 3).reshape(N, Tk, Dh)
            vf = v.transpose(0, 2, 1, 3).reshape(N, Tk, Dh)
            if key_valid is not None:
                lengths = jnp.repeat(
                    key_valid.astype(jnp.int32).sum(-1), H, axis=0
                )
            else:
                lengths = None
            if deterministic:
                o = banded_flash_attention(qf, kf, vf, pos_band, lengths)
            else:
                seed = jnp.int32(0)
                if self.dropout > 0.0:
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (), 0, 2**31 - 1, jnp.int32
                    )
                o = banded_attention_train(
                    qf, kf, vf, pos_band, lengths,
                    dropout_rate=self.dropout, seed=seed,
                )
            o = o.reshape(B, H, Tq, Dh).transpose(0, 2, 1, 3)
            out = self.out_proj(o.reshape(B, Tq, self.d_model))
            return out, None, new_cache

        score_dtype = jnp.float32 if self.scores_f32 else self.dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(score_dtype)

        if pos_band is not None:
            logits = logits + relative_bias_banded(q, pos_band).astype(
                score_dtype
            )
        elif pos_table is not None:
            if cache is not None and cache_index is not None:
                q_pos = cache_index + jnp.arange(Tq)
            else:
                q_pos = jnp.arange(Tq)
            k_pos = jnp.arange(Tk)
            logits = logits + relative_bias(
                q, pos_table, q_pos, k_pos, max_dist
            ).astype(score_dtype)

        mask = None
        if key_valid is not None:
            mask = key_valid[:, None, None, :]  # [B, 1, 1, Tk]
        if causal:
            if cache is not None and cache_index is not None:
                # step decode: key j visible from query i = cache_index + qi iff j <= i
                j = jnp.arange(Tk)[None, None, None, :]
                i = (cache_index + jnp.arange(Tq))[None, None, :, None]
                cm = j <= i
            else:
                cm = jnp.tril(jnp.ones((Tq, Tk), dtype=bool))[None, None]
            mask = cm if mask is None else (mask & cm)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.asarray(NEG_INF, logits.dtype))

        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = weights.astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout, probs.shape
            )
            probs = probs * keep / (1.0 - self.dropout)

        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(self.dtype))
        out = out.reshape(B, Tq, self.d_model)
        out = self.out_proj(out)

        w = weights if return_weights else None
        return out, w, new_cache

    def precompute_kv(self, x_kv):
        """Project encoder output once for cross-attention decode (static_kv,
        reference multihead_attention.py:207-209)."""
        B, Tk, _ = x_kv.shape
        k = self.k_proj(x_kv).reshape(B, Tk, self.num_heads, self.head_dim)
        v = self.v_proj(x_kv).reshape(B, Tk, self.num_heads, self.head_dim)
        return {"k": k, "v": v}
