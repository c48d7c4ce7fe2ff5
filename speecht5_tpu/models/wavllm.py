"""WavLLM: Whisper+WavLM dual speech encoder -> LLaMA decoder with LoRA/LoRA-MoE.

Behavioral spec from reference WavLLM/wavllm/models/:
- speechllm_model.py:43-91 (Conv1dSubsampler with GLU, stride-2 stack),
  :183-214 (dual encoders: Whisper-large-v2 + WavLM, each adapted and summed
  with weight wavlm_output_weight; linear audio_proj into the LLaMA width);
- whisper_encoder.py (HF Whisper encoder: 2x conv + sinusoidal positions +
  pre-LN transformer);
- llama.py:169-345 (RMSNorm, rotary embeddings, LoRA on wq/wk/wv/wo with
  scaling alpha/r and zero-init B, KV-cache incremental decode, SwiGLU FFN),
  :147-149 (LoRA-MoE: expert LoRA pairs mixed by a gate);
- data packs [left_prompt | speech | right_prompt | target] token segments
  around the audio features (speechllm_dataset.py:145-163).

All-native flax, at the released checkpoints' true topologies: the Whisper
encoder, the WavLM encoder (models/wavlm.py) and the LLaMA decoder each have
an HF ``transformers`` state-dict converter (utils/convert_components.py)
with numeric parity asserted in tests/test_wavllm_hf.py, so the actual
pretrained weights the reference builds on can be loaded.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace as dc_replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import TransformerConfig, RelPosConfig
from ..ops.positional import espnet_sinusoidal_table
from ..utils.masks import length_mask
from .layers import EncoderLayer
from .wavlm import WavLMConfig, WavLMEncoderModel, wavlm_tiny


@dataclass(frozen=True)
class WavLLMConfig:
    # whisper-style encoder
    n_mels: int = 80
    whisper_d: int = 1280
    whisper_layers: int = 32
    whisper_heads: int = 20
    whisper_ffn: int = 5120
    max_source_positions: int = 1500   # whisper learned-position table length
    # wavlm encoder (true checkpoint topology, models/wavlm.py)
    use_wavlm: bool = True
    wavlm: WavLMConfig = field(default_factory=WavLMConfig)
    wavlm_output_weight: float = 0.5
    # llama decoder
    vocab_size: int = 32000
    llama_dim: int = 4096
    llama_layers: int = 32
    llama_heads: int = 32
    llama_ffn: int = 11008
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    # adapters
    adapter_mid: int = 512
    # lora
    lora_r: int = 8
    lora_alpha: int = 32
    lora_dropout: float = 0.1
    lora_moe: bool = False
    n_experts: int = 3
    # ids
    pad_id: int = 0
    bos_id: int = 1
    eos_id: int = 2
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def wavllm_tiny(**kw) -> WavLLMConfig:
    cfg = WavLLMConfig(
        n_mels=20, whisper_d=32, whisper_layers=2, whisper_heads=4,
        whisper_ffn=64, max_source_positions=64,
        wavlm=wavlm_tiny(),
        vocab_size=48, llama_dim=32, llama_layers=2, llama_heads=4,
        llama_ffn=64, max_seq_len=128, adapter_mid=32, lora_r=4,
        lora_alpha=8, lora_dropout=0.0,
    )
    return dc_replace(cfg, **kw)


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        y = xf * jax.lax.rsqrt(jnp.mean(xf ** 2, axis=-1, keepdims=True) + 1e-6)
        return (y * w).astype(x.dtype)


def rope_tables(head_dim: int, max_len: int, theta: float):
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2) / head_dim))
    t = jnp.arange(max_len)
    ang = jnp.outer(t, freqs)                      # [L, Dh/2]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, cos, sin, positions):
    """x: [B, T, H, Dh]; interleaved complex pairs (llama view_as_complex)."""
    c = cos[positions][:, :, None, :]              # [B, T, 1, Dh/2]
    s = sin[positions][:, :, None, :]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    o1 = x1 * c - x2 * s
    o2 = x1 * s + x2 * c
    out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class LoRALinear(nn.Module):
    """Frozen-style base kernel + low-rank update (reference llama.py:212-276):
    y = x W + (drop(x) A B) * alpha/r.  With ``n_experts`` > 0 the update is a
    gate-weighted mixture of expert (A, B) pairs (LoRA-MoE,
    speechllm_model.py:263-278)."""

    features: int
    r: int
    alpha: float
    dropout: float = 0.0
    n_experts: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate=None, deterministic=True):
        d_in = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (d_in, self.features)
        )
        y = x @ w.astype(x.dtype)
        if self.r <= 0:
            return y
        scale = self.alpha / self.r
        xd = x
        if self.dropout > 0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout, x.shape
            )
            xd = x * keep / (1.0 - self.dropout)
        if self.n_experts > 0:
            A = self.param(
                "lora_A",
                nn.initializers.he_uniform(),
                (self.n_experts, d_in, self.r),
            )
            B = self.param(
                "lora_B", nn.initializers.zeros,
                (self.n_experts, self.r, self.features),
            )
            # gate: [batch, n_experts]; expert updates mixed per example
            up = jnp.einsum("btd,edr,erf->betf", xd.astype(jnp.float32),
                            A, B)
            up = jnp.einsum("betf,be->btf", up, gate.astype(jnp.float32))
        else:
            A = self.param(
                "lora_A", nn.initializers.he_uniform(), (d_in, self.r)
            )
            B = self.param(
                "lora_B", nn.initializers.zeros, (self.r, self.features)
            )
            up = (xd.astype(jnp.float32) @ A) @ B
        return y + (scale * up).astype(y.dtype)


class LLaMABlock(nn.Module):
    cfg: WavLLMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        n_exp = cfg.n_experts if cfg.lora_moe else 0
        lora = lambda name: LoRALinear(
            cfg.llama_dim, cfg.lora_r, cfg.lora_alpha, cfg.lora_dropout,
            n_exp, self.dtype, name=name,
        )
        self.wq = lora("wq")
        self.wk = lora("wk")
        self.wv = lora("wv")
        self.wo = lora("wo")
        self.attn_norm = RMSNorm(cfg.llama_dim, name="attention_norm")
        self.ffn_norm = RMSNorm(cfg.llama_dim, name="ffn_norm")
        dense = lambda d, name: nn.Dense(
            d, use_bias=False, dtype=self.dtype, name=name
        )
        self.w1 = dense(cfg.llama_ffn, "w1")
        self.w3 = dense(cfg.llama_ffn, "w3")
        self.w2 = dense(cfg.llama_dim, "w2")

    def __call__(self, x, cos, sin, positions, *, mask=None, cache=None,
                 cache_index=None, gate=None, deterministic=True,
                 slots=None):
        """``positions`` drive RoPE (per-sample REAL token counts so batched
        padding can't shift the geometry); ``slots`` are the raw buffer
        indices used for causal masking (default: positions)."""
        cfg = self.cfg
        H = cfg.llama_heads
        Dh = cfg.llama_dim // H
        B, T, _ = x.shape
        if slots is None:
            slots = positions

        h = self.attn_norm(x)
        q = self.wq(h, gate, deterministic).reshape(B, T, H, Dh)
        k = self.wk(h, gate, deterministic).reshape(B, T, H, Dh)
        v = self.wv(h, gate, deterministic).reshape(B, T, H, Dh)
        q = apply_rope(q, cos, sin, positions)
        k = apply_rope(k, cos, sin, positions)

        new_cache = None
        if cache is not None:
            k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0)
            )
            v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0)
            )
            new_cache = {"k": k, "v": v}

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits / jnp.sqrt(Dh).astype(jnp.float32)
        Tk = k.shape[1]
        j = jnp.arange(Tk)[None, None, None, :]
        i = slots[:, None, :, None]
        causal = j <= i
        if mask is not None:
            causal = causal & mask[:, None, None, :]
        logits = jnp.where(causal, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(self.dtype))
        o = o.reshape(B, T, cfg.llama_dim)
        x = x + self.wo(o, gate, deterministic)

        h = self.ffn_norm(x)
        x = x + self.w2(jax.nn.silu(self.w1(h)) * self.w3(h))
        return x, new_cache


class WhisperStyleEncoder(nn.Module):
    """HF Whisper encoder topology: 2 convs (k=3, pad 1, stride 1 then 2) +
    learned positional table (sinusoidal-initialized, stored in checkpoints)
    + pre-LN transformer + final LN (reference whisper_encoder.py; HF
    modeling_whisper.WhisperEncoder)."""

    cfg: WavLLMConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, mel_lengths, deterministic=True):
        cfg = self.cfg
        x = nn.Conv(cfg.whisper_d, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv1")(mel.astype(self.dtype))
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.whisper_d, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        T = x.shape[1]
        pos = self.param(
            "embed_positions",
            lambda _key, shape: jnp.asarray(
                espnet_sinusoidal_table(shape[0], shape[1]), jnp.float32
            ),
            (cfg.max_source_positions, cfg.whisper_d),
        )
        x = x + pos[None, :T].astype(x.dtype)
        out_lengths = (mel_lengths + 1) // 2
        valid = length_mask(out_lengths, T)
        lcfg = TransformerConfig(
            d_model=cfg.whisper_d, ffn_dim=cfg.whisper_ffn,
            num_heads=cfg.whisper_heads, dropout=0.0, attention_dropout=0.0,
            layer_norm_first=True,
            rel_pos=RelPosConfig(enabled=False), use_rel_pos_bias=False,
        )
        for i in range(cfg.whisper_layers):
            x, _ = EncoderLayer(lcfg, self.dtype, name=f"layers_{i}")(
                x, key_valid=valid, deterministic=deterministic
            )
        x = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(x)
        return x.astype(self.dtype), out_lengths


class Conv1dSubsampler(nn.Module):
    """GLU conv subsampler (reference speechllm_model.py:43-91)."""

    mid: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths):
        for i, feats in enumerate((self.mid, self.out)):
            x = nn.Conv(feats * 2, (3,), strides=(2,), padding=[(1, 1)],
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.glu(x, axis=-1)
            lengths = (lengths + 1) // 2
        return x, lengths


class WavLLMModel(nn.Module):
    cfg: WavLLMConfig

    def setup(self):
        cfg = self.cfg
        dt = cfg.compute_dtype
        self.whisper = WhisperStyleEncoder(cfg, dt, name="whisper")
        self.whisper_adapter = Conv1dSubsampler(
            cfg.adapter_mid, cfg.llama_dim, dt, name="whisper_adapter"
        )
        self.audio_proj = nn.Dense(cfg.llama_dim, dtype=dt, name="audio_proj")
        if cfg.use_wavlm:
            self.wavlm = WavLMEncoderModel(cfg.wavlm, dt, name="wavlm")
            self.wavlm_adapter = Conv1dSubsampler(
                cfg.adapter_mid, cfg.llama_dim, dt, name="wavlm_adapter"
            )
            self.wavlm_audio_proj = nn.Dense(
                cfg.llama_dim, dtype=dt, name="wavlm_audio_proj"
            )
        self.tok_embeddings = nn.Embed(
            cfg.vocab_size, cfg.llama_dim, name="tok_embeddings"
        )
        # "llama_layers_" namespace keeps the LLaMA trunk distinct from the
        # encoder layer stacks for checkpoint grafting (convert_components.py)
        self.layers = [
            LLaMABlock(cfg, dt, name=f"llama_layers_{i}")
            for i in range(cfg.llama_layers)
        ]
        self.norm = RMSNorm(cfg.llama_dim, name="norm")
        self.output = nn.Dense(
            cfg.vocab_size, use_bias=False, dtype=jnp.float32, name="output"
        )
        if cfg.lora_moe:
            self.moe_gate = nn.Dense(
                cfg.n_experts, dtype=jnp.float32, name="moe_gate"
            )
        cos, sin = rope_tables(
            cfg.llama_dim // cfg.llama_heads, cfg.max_seq_len, cfg.rope_theta
        )
        self.rope_cos, self.rope_sin = cos, sin

    # --------------------------------------------------------------- audio

    def encode_audio(self, mel, mel_lengths, wav=None, wav_lengths=None, *,
                     deterministic=True):
        """Dual-encoder audio features in LLaMA space: whisper branch +
        wavlm_output_weight * wavlm branch (reference speechllm_model.py
        :199-214, 362-378)."""
        cfg = self.cfg
        x, lens = self.whisper(mel, mel_lengths, deterministic=deterministic)
        x, lens = self.whisper_adapter(x, lens)
        feats = self.audio_proj(x)
        if cfg.use_wavlm and wav is not None:
            w, _ = self.wavlm(wav, wav_lengths, deterministic=deterministic)
            wl = cfg.wavlm.conv.out_length(wav_lengths)
            w, wl = self.wavlm_adapter(w, wl)
            w = self.wavlm_audio_proj(w)
            T = min(feats.shape[1], w.shape[1])
            feats = feats[:, :T] + cfg.wavlm_output_weight * w[:, :T]
            lens = jnp.minimum(lens, wl)
        return feats, jnp.minimum(lens, feats.shape[1])

    # ----------------------------------------------------------------- SFT

    def _llama(self, embeds, positions, *, valid=None, caches=None,
               cache_index=None, gate=None, deterministic=True, slots=None):
        x = embeds
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            x, nc = layer(
                x, self.rope_cos, self.rope_sin, positions, mask=valid,
                cache=None if caches is None else caches[i],
                cache_index=cache_index, gate=gate,
                deterministic=deterministic, slots=slots,
            )
            if new_caches is not None:
                new_caches.append(nc)
        x = self.norm(x)
        return self.output(x.astype(jnp.float32)), new_caches

    def _pack_prefix(self, audio, audio_lens, prompt_tokens, left_tokens=None):
        """Pack the SFT/decode prefix [left? | audio | prompt] (reference
        llama.py:608-618: the left/system prompt precedes the speech, the task
        instruction follows it).  Returns (seq, valid, first_idx) where
        first_idx[b] is the slot whose logits predict the first target token
        (the last REAL prompt token — prompts are right-padded)."""
        cfg = self.cfg
        segs, valids = [], []
        Ll = 0
        if left_tokens is not None:
            segs.append(self.tok_embeddings(left_tokens).astype(audio.dtype))
            valids.append(left_tokens != cfg.pad_id)
            Ll = left_tokens.shape[1]
        La = audio.shape[1]
        segs.append(audio)
        valids.append(length_mask(audio_lens, La))
        p_emb = self.tok_embeddings(prompt_tokens).astype(audio.dtype)
        segs.append(p_emb)
        valids.append(prompt_tokens != cfg.pad_id)
        seq = jnp.concatenate(segs, axis=1)
        valid = jnp.concatenate(valids, axis=1)
        n_prompt = (prompt_tokens != cfg.pad_id).astype(jnp.int32).sum(1)
        # empty prompt: fall back to the last REAL audio frame (a padded
        # prompt slot is attention-masked, so its query output is garbage)
        first_idx = jnp.where(
            n_prompt > 0,
            Ll + La + n_prompt - 1,
            Ll + jnp.maximum(audio_lens, 1) - 1,
        )                                                      # [B]
        return seq, valid, first_idx

    def _moe_gate(self, audio, audio_lens):
        if not self.cfg.lora_moe:
            return None
        La = audio.shape[1]
        m = length_mask(audio_lens, La)[..., None]
        pooled = (audio * m).sum(1) / jnp.maximum(
            audio_lens, 1
        )[:, None].astype(audio.dtype)
        return jax.nn.softmax(self.moe_gate(pooled.astype(jnp.float32)), -1)

    def forward_sft(self, mel, mel_lengths, prompt_tokens, target_tokens,
                    wav=None, wav_lengths=None, left_tokens=None, *,
                    deterministic=True):
        """Packed [left? | audio | prompt | target] SFT forward (reference
        speechllm_dataset.py:145-163 segments, llama.py:608-618 order; loss is
        CE over the target segment).  Returns (logits [B, Lt, V] predicting
        target_tokens, gate or None)."""
        cfg = self.cfg
        audio, audio_lens = self.encode_audio(
            mel, mel_lengths, wav, wav_lengths, deterministic=deterministic
        )
        prefix, prefix_valid, first_idx = self._pack_prefix(
            audio, audio_lens, prompt_tokens, left_tokens
        )
        t_emb = self.tok_embeddings(target_tokens).astype(audio.dtype)
        L0, Lt = prefix.shape[1], t_emb.shape[1]
        seq = jnp.concatenate([prefix, t_emb], axis=1)
        valid = jnp.concatenate(
            [prefix_valid, target_tokens != cfg.pad_id], axis=1
        )
        # RoPE positions count REAL tokens only, so the segment geometry is
        # independent of batch padding (the reference packs segments
        # per-sample without intra-sequence padding); causal masking uses the
        # raw slot indices
        positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
        positions = jnp.maximum(positions, 0)
        slots = jnp.broadcast_to(jnp.arange(L0 + Lt)[None], seq.shape[:2])
        gate = self._moe_gate(audio, audio_lens)
        logits, _ = self._llama(
            seq, positions, valid=valid, gate=gate,
            deterministic=deterministic, slots=slots,
        )
        # logits at sequence index i predict token i+1.  Target token 0 is
        # predicted from the last REAL prompt token (padded prompt slots are
        # garbage queries), gathered per sample; tokens 1.. are predicted
        # from the real target embeddings at fixed indices.
        first = jnp.take_along_axis(
            logits, first_idx[:, None, None].astype(jnp.int32), axis=1
        )                                                     # [B, 1, V]
        rest = logits[:, L0 : L0 + Lt - 1]
        return jnp.concatenate([first, rest], axis=1), gate

    # ------------------------------------------------------------ generate

    def _prefill(self, mel, mel_lengths, prompt_tokens, left_tokens,
                 wav, wav_lengths, max_new):
        """Encode audio, pack [left? | audio | prompt], run the prefill pass
        with max_new free cache slots.  Returns (first_logits [B, V], caches,
        valid [B, L0+max_new], n_real [B], gate, L0)."""
        cfg = self.cfg
        audio, audio_lens = self.encode_audio(mel, mel_lengths, wav, wav_lengths)
        B = audio.shape[0]
        seq, prefix_valid, first_idx = self._pack_prefix(
            audio, audio_lens, prompt_tokens, left_tokens
        )
        L0 = seq.shape[1]
        Lmax = L0 + max_new
        gate = self._moe_gate(audio, audio_lens)

        H, Dh = cfg.llama_heads, cfg.llama_dim // cfg.llama_heads
        caches = [
            {"k": jnp.zeros((B, Lmax, H, Dh), cfg.compute_dtype),
             "v": jnp.zeros((B, Lmax, H, Dh), cfg.compute_dtype)}
            for _ in self.layers
        ]
        valid = jnp.concatenate(
            [prefix_valid, jnp.zeros((B, max_new), bool)], axis=1
        )
        # real-token RoPE positions + raw slots for causal (see forward_sft)
        positions = jnp.maximum(
            jnp.cumsum(prefix_valid.astype(jnp.int32), axis=1) - 1, 0
        )
        slots = jnp.broadcast_to(jnp.arange(L0)[None], (B, L0))
        logits, caches = self._llama(
            seq, positions, valid=valid, caches=caches, cache_index=0,
            gate=gate, slots=slots,
        )
        # first generated token is predicted from the last REAL prompt token
        first_logits = jnp.take_along_axis(
            logits, first_idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        n_real = prefix_valid.astype(jnp.int32).sum(1)        # [B]
        return first_logits, caches, valid, n_real, gate, L0

    def generate(self, mel, mel_lengths, prompt_tokens, *, max_new: int = 16,
                 wav=None, wav_lengths=None, left_tokens=None):
        """Greedy decode with KV cache: prefill [left? | audio | prompt], then
        step (reference inference/generate.py contract)."""
        first_logits, caches, valid, n_real, gate, L0 = self._prefill(
            mel, mel_lengths, prompt_tokens, left_tokens, wav, wav_lengths,
            max_new,
        )
        B = first_logits.shape[0]
        dt = self.cfg.compute_dtype
        tok = jnp.argmax(first_logits, axis=-1)
        out = jnp.zeros((B, max_new), tok.dtype).at[:, 0].set(tok)

        def body(t, carry):
            tok, caches, valid, out = carry
            valid = valid.at[:, L0 + t].set(True)
            emb = self.tok_embeddings(tok)[:, None].astype(dt)
            pos = (n_real + t)[:, None]
            slot = jnp.full((B, 1), L0 + t, jnp.int32)
            logits, caches = self._llama(
                emb, pos, valid=valid, caches=caches, cache_index=L0 + t,
                gate=gate, slots=slot,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            out = out.at[:, t + 1].set(nxt)
            return nxt, caches, valid, out

        # lax loop: a python loop would inline max_new copies of the full
        # LLaMA stack into the program (minutes-long compiles at real sizes)
        _, _, _, out = jax.lax.fori_loop(
            0, max_new - 1, body, (tok, caches, valid, out)
        )
        return out

    def generate_beam(self, mel, mel_lengths, prompt_tokens, *,
                      beam_size: int = 4, max_new: int = 16,
                      length_penalty: float = 1.0,
                      wav=None, wav_lengths=None, left_tokens=None):
        """Beam-search decode over the LLaMA decoder (reference
        inference/sequence_generator.py drives WavLLM with a fairseq beam;
        here the whole loop is one jittable program): prefill once at batch
        B, expand to B*beam cached lanes, topk over beam*V each step with
        EOS finalization and GNMT length normalization.

        Returns (tokens [B, max_new] best hypothesis, scores [B] normalized).
        """
        cfg = self.cfg
        K = beam_size
        first_logits, caches, valid, n_real, gate, L0 = self._prefill(
            mel, mel_lengths, prompt_tokens, left_tokens, wav, wav_lengths,
            max_new,
        )
        B, V = first_logits.shape
        dt = cfg.compute_dtype
        NEG = jnp.float32(-1e9)

        # seed: top-K first tokens per sample
        lp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
        scores, tok = jax.lax.top_k(lp0, K)                   # [B, K]
        out = jnp.zeros((B, K, max_new), jnp.int32)
        out = out.at[:, :, 0].set(tok)
        finished = tok == cfg.eos_id                          # [B, K]

        def tile(x):
            return jnp.repeat(x, K, axis=0)                   # [B*K, ...]

        caches = [{"k": tile(c["k"]), "v": tile(c["v"])} for c in caches]
        valid = tile(valid)
        n_real_bk = tile(n_real)
        gate_bk = None if gate is None else tile(gate)

        def body(t, carry):
            # step t consumes the token generated at step t-1 (cache slot
            # L0+t-1, RoPE position n_real+t-1) and emits token t
            scores, tok, out, finished, caches, valid = carry
            valid = valid.at[:, L0 + t - 1].set(True)
            emb = self.tok_embeddings(tok.reshape(B * K))[:, None].astype(dt)
            pos = (n_real_bk + t - 1)[:, None]
            slot = jnp.full((B * K, 1), L0 + t - 1, jnp.int32)
            logits, new_caches = self._llama(
                emb, pos, valid=valid, caches=caches, cache_index=L0 + t - 1,
                gate=gate_bk, slots=slot,
            )
            lp = jax.nn.log_softmax(
                logits[:, -1].astype(jnp.float32), axis=-1
            ).reshape(B, K, V)
            # finished lanes only extend with EOS at zero cost, so their
            # cumulative score is frozen and they stay selectable
            lp = jnp.where(
                finished[:, :, None],
                jnp.full((V,), NEG).at[cfg.eos_id].set(0.0)[None, None],
                lp,
            )
            cand = scores[:, :, None] + lp                    # [B, K, V]
            scores, flat = jax.lax.top_k(cand.reshape(B, K * V), K)
            origin = flat // V                                # [B, K]
            tok = flat % V
            # reorder beam state by origin lane; this step emitted token t
            out = jnp.take_along_axis(out, origin[:, :, None], axis=1)
            out = out.at[:, :, t].set(tok)
            finished = jnp.take_along_axis(finished, origin, axis=1)
            finished = finished | (tok == cfg.eos_id)
            flat_origin = (
                jnp.arange(B)[:, None] * K + origin
            ).reshape(B * K)
            caches = [
                {"k": c["k"][flat_origin], "v": c["v"][flat_origin]}
                for c in new_caches
            ]
            valid = valid[flat_origin]
            return scores, tok, out, finished, caches, valid

        scores, tok, out, finished, _, _ = jax.lax.fori_loop(
            1, max_new, body, (scores, tok, out, finished, caches, valid)
        )
        # GNMT normalization over generated length (EOS-terminated lanes use
        # their true length; running lanes use max_new)
        is_eos = out == cfg.eos_id
        any_eos = is_eos.any(-1)
        first_eos = jnp.argmax(is_eos, axis=-1)
        length = jnp.where(any_eos, first_eos + 1, max_new)
        norm = scores / (length.astype(jnp.float32) ** length_penalty)
        best = jnp.argmax(norm, axis=1)                       # [B]
        best_out = jnp.take_along_axis(
            out, best[:, None, None], axis=1
        )[:, 0]
        best_score = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
        return best_out, best_score


def lora_param_filter(path_tuple) -> bool:
    """True for trainable SFT params (LoRA A/B, gate, adapters, projections) —
    the reference freezes the LLaMA trunk and audio encoders
    (freeze_gpt/freeze_audio_encoder, speechllm_model.py:131-136)."""
    flat = "/".join(str(p) for p in path_tuple)
    if "lora_A" in flat or "lora_B" in flat or "moe_gate" in flat:
        return True
    return any(k in flat for k in (
        "whisper_adapter", "wavlm_adapter", "audio_proj", "wavlm_audio_proj"
    ))
