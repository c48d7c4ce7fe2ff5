"""Shared transformer decoder stack with functional KV-cached decoding.

Behavioral spec from reference modules/decoder.py:33-324 (TransformerDecoder):
- causal self-attn + cross-attn layers; final LayerNorm only in pre-LN configs
  (decoder.py:76-81);
- a rel-pos table is instantiated (decoder.py:83-84) but the self-attention is
  built without the bias hook, so it is inert — we keep the table for checkpoint
  parity only when cfg.rel_pos.enabled;
- cross-attention weights of an alignment layer are exported for TTS guided /
  diagnostic attention (decoder.py:240-254).

TPU-native: decode uses an explicit cache pytree
  {"index": int32, "layers": [{"k","v"} ...], "cross": [{"k","v"} ...]}
with fixed [B, max_len, H, Dh] buffers so whole AR loops run under lax.while_loop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn
import jax

from ..config import TransformerConfig
from .layers import DecoderLayer
from .encoder import RelPosTable


class TransformerDecoder(nn.Module):
    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        # nn.remat preserves the param scope, so checkpoints stay compatible
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(5, 10, 11))
            if cfg.remat else DecoderLayer
        )
        self.layers = [
            layer_cls(cfg, self.dtype, self.param_dtype, name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]
        if cfg.layer_norm_first:
            self.layer_norm = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm"
            )
        if cfg.rel_pos.enabled:
            self.pos_emb = RelPosTable(
                cfg.rel_pos.max_distance, cfg.head_dim, self.param_dtype, name="pos_emb"
            )

    def _pos_table(self):
        if self.cfg.rel_pos.enabled and self.cfg.use_rel_pos_bias:
            return self.pos_emb()
        return None

    def __call__(
        self,
        x,
        enc=None,
        *,
        enc_valid=None,
        self_valid=None,
        causal: bool = True,
        deterministic: bool = True,
        alignment_layer: Optional[int] = None,  # -1 => all layers' cross weights
    ):
        """Teacher-forced full forward.  x: [B, Ttgt, D] (from a decoder prenet).

        Returns (features [B, Ttgt, D], cross_attn):
        cross_attn is [L, B, H, Ttgt, Tsrc] if alignment_layer == -1, else
        [B, H, Ttgt, Tsrc] of the chosen layer, else None.
        """
        cfg = self.cfg
        pos_table = self._pos_table()

        all_w = []
        want_all = alignment_layer == -1
        for i, layer in enumerate(self.layers):
            need_w = want_all or (alignment_layer is not None and i == alignment_layer)
            x, w, _ = layer(
                x, enc, enc_valid, self_valid, causal, pos_table,
                None, None, None, deterministic, need_w,
            )
            if need_w and w is not None:
                all_w.append(w)

        if cfg.layer_norm_first:
            x = self.layer_norm(x).astype(self.dtype)

        cross = None
        if all_w:
            cross = jnp.stack(all_w) if want_all else all_w[-1]
        return x, cross

    # ---- incremental decoding ----

    def init_cache(self, enc, batch_size: int, max_len: int, cache_dtype=None):
        """Build the decode cache: zeroed self-attn buffers + precomputed cross
        K/V.  ``enc=None`` builds a decoder-only cache (no cross attention —
        codec-LM use, e.g. VALL-E X AR stage)."""
        cfg = self.cfg
        dt = cache_dtype or self.dtype
        H, Dh = cfg.num_heads, cfg.head_dim
        zeros = jnp.zeros((batch_size, max_len, H, Dh), dt)
        layers = [{"k": zeros, "v": zeros} for _ in range(cfg.num_layers)]
        cross = [
            layer.init_cross_kv(enc) if enc is not None else None
            for layer in self.layers
        ]
        return {"index": jnp.zeros((), jnp.int32), "layers": layers, "cross": cross}

    def decode_step(
        self,
        x,
        cache,
        *,
        enc_valid=None,
        self_valid=None,       # bool [B, max_len]: attendable cache positions
        deterministic: bool = True,
        need_cross_weights: bool = False,
        cache_rows=None,       # int [B, max_len]: ancestry map (gather-free
        #                        beam reorder — see MultiheadAttention)
    ):
        """One AR step.  x: [B, 1, D] prenet output for the current position.

        ``self_valid`` masks self-attention over the cache buffer (needed when
        a prefilled prefix contains padding, e.g. batched codec-LM prompts);
        the causal mask handles not-yet-written positions either way.

        Returns (features [B, 1, D], new_cache, cross_w or None).
        """
        cfg = self.cfg
        pos_table = self._pos_table()
        idx = cache["index"]

        new_layers = []
        cross_w = None
        for i, layer in enumerate(self.layers):
            x, w, new_self = layer(
                x, None, enc_valid, self_valid, True, pos_table,
                cache["layers"][i], cache["cross"][i], idx,
                deterministic, need_cross_weights, cache_rows=cache_rows,
            )
            new_layers.append(new_self)
            if need_cross_weights and w is not None:
                cross_w = [w] if cross_w is None else cross_w + [w]

        if cfg.layer_norm_first:
            x = self.layer_norm(x).astype(self.dtype)

        # advance by the number of positions written (prefill passes Tq > 1)
        new_cache = {"index": idx + x.shape[1], "layers": new_layers,
                     "cross": cache["cross"]}
        if cross_w is not None:
            cross_w = jnp.stack(cross_w)  # [L, B, H, Tq, Tsrc]
        return x, new_cache, cross_w


def reorder_cache(cache, order):
    """Gather all batch-major cache tensors by ``order`` (beam reordering)."""
    layers = [{k: v[order] for k, v in l.items()} for l in cache["layers"]]
    cross = [
        {k: v[order] for k, v in l.items()} if l is not None else None
        for l in cache["cross"]
    ]
    return {"index": cache["index"], "layers": layers, "cross": cross}
