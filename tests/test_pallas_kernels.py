"""Pallas kernel parity tests (interpret mode on CPU; same code compiles on
TPU — see bench_kernels.py for the measured speedups)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.ops.mel import log_mel_spectrogram, log_mel_numpy
from speecht5_tpu.ops.pallas_kernels import fused_log_mel, flash_attention_bias
from speecht5_tpu.models.attention import relative_bias


class TestFusedLogMel:
    def test_matches_numpy_reference(self, rng):
        wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.2
        got = np.asarray(fused_log_mel(
            jnp.asarray(wav), n_fft=512, hop=128, n_mels=24, block_frames=32
        ))
        for b in range(2):
            want = log_mel_numpy(wav[b], n_fft=512, hop=128, n_mels=24)
            assert got[b].shape == want.shape
            np.testing.assert_allclose(got[b], want, atol=2e-3)

    def test_matches_xla_path(self, rng):
        wav = rng.standard_normal((1, 12800)).astype(np.float32) * 0.1
        got = np.asarray(fused_log_mel(
            jnp.asarray(wav), n_fft=512, hop=128, n_mels=24, block_frames=16
        ))
        want = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav), n_fft=512, hop=128, n_mels=24
        ))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_non_divisible_frames(self, rng):
        """Frame count not a multiple of the block: tail handled by padding."""
        wav = rng.standard_normal((1, 5000)).astype(np.float32)
        got = np.asarray(fused_log_mel(
            jnp.asarray(wav), n_fft=512, hop=128, n_mels=24, block_frames=32
        ))
        want = log_mel_numpy(wav[0], n_fft=512, hop=128, n_mels=24)
        assert got.shape == (1,) + want.shape
        np.testing.assert_allclose(got[0], want, atol=2e-3)


class TestBandedFlashAttention:
    def test_matches_xla_encoder_path(self, rng):
        """Full encoder forward with use_pallas_attn on vs off must match
        (interpret mode on CPU; same kernel compiles on TPU)."""
        import dataclasses
        import jax
        from speecht5_tpu.config import speecht5_tiny, replace
        from speecht5_tpu.models.speecht5 import init_model

        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        pcfg = replace(
            cfg, encoder=dataclasses.replace(cfg.encoder, use_pallas_attn=True)
        )
        pmodel, _ = init_model(pcfg, jax.random.PRNGKey(0))

        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        lengths = jnp.asarray([4000, 2500])
        ref = model.apply(variables, wav, lengths, deterministic=True,
                          method="encode_speech")
        got = pmodel.apply(variables, wav, lengths, deterministic=True,
                           method="encode_speech")
        np.testing.assert_allclose(
            np.asarray(got["encoder_out"]), np.asarray(ref["encoder_out"]),
            atol=2e-4,
        )

    def test_kernel_vs_dense(self, rng):
        from speecht5_tpu.ops.pallas_kernels import banded_flash_attention
        from speecht5_tpu.models.attention import (
            band_from_table, relative_bias,
        )

        N, T, D, M = 4, 48, 16, 8
        q = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((2 * M, D)), jnp.float32) * 0.2
        band = band_from_table(table, T, M)
        lengths = jnp.asarray([48, 48, 30, 17])

        got = np.asarray(banded_flash_attention(
            q, k, v, band, lengths, block_q=16
        ))

        pos = jnp.arange(T)
        bias = np.asarray(relative_bias(
            q.reshape(N, T, 1, D), table, pos, pos, M
        ))[:, 0]
        s = np.einsum("nqd,nkd->nqk", np.asarray(q), np.asarray(k)) + bias
        ok = np.arange(T)[None, None, :] < np.asarray(lengths)[:, None, None]
        s = np.where(ok, s, -1e9)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("nqk,nkd->nqd", p, np.asarray(v))
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestFlashAttentionBias:
    def _reference(self, q, k, v, bias, valid):
        s = np.einsum("nqd,nkd->nqk", q, k) + bias
        if valid is not None:
            s = np.where(valid[:, None, :], s, -1e9)
        s = s - s.max(-1, keepdims=True)
        p = np.exp(s)
        p = p / p.sum(-1, keepdims=True)
        return np.einsum("nqk,nkd->nqd", p, v)

    def test_matches_dense_attention(self, rng):
        N, T, D = 3, 64, 32
        q = rng.standard_normal((N, T, D)).astype(np.float32) * 0.3
        k = rng.standard_normal((N, T, D)).astype(np.float32) * 0.3
        v = rng.standard_normal((N, T, D)).astype(np.float32)
        bias = rng.standard_normal((N, T, T)).astype(np.float32) * 0.5
        valid = np.ones((N, T), bool)
        valid[1, 40:] = False
        got = np.asarray(flash_attention_bias(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias), jnp.asarray(valid),
            block_q=32, block_k=32,
        ))
        want = self._reference(q, k, v, bias, valid)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_with_relative_position_bias(self, rng):
        """End-to-end with the SpeechT5 rel-pos term from relative_bias()."""
        B, H, T, Dh, M = 2, 2, 48, 16, 8
        q = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32) * 0.2
        k = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32) * 0.2
        v = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.float32)
        table = jnp.asarray(rng.standard_normal((2 * M, Dh)), jnp.float32) * 0.1
        pos = jnp.arange(T)
        bias = relative_bias(q, table, pos, pos, M)   # [B, H, T, T]

        qf = q.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        kf = k.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        vf = v.transpose(0, 2, 1, 3).reshape(B * H, T, Dh)
        bf = bias.reshape(B * H, T, T)
        got = np.asarray(flash_attention_bias(
            qf, kf, vf, bf, block_q=16, block_k=16
        ))
        want = self._reference(
            np.asarray(qf), np.asarray(kf), np.asarray(vf),
            np.asarray(bf), None,
        )
        np.testing.assert_allclose(got, want, atol=3e-4)

    def test_uneven_lengths_padding(self, rng):
        """Tq/Tk not multiples of the blocks."""
        N, Tq, Tk, D = 2, 37, 53, 16
        q = rng.standard_normal((N, Tq, D)).astype(np.float32) * 0.3
        k = rng.standard_normal((N, Tk, D)).astype(np.float32) * 0.3
        v = rng.standard_normal((N, Tk, D)).astype(np.float32)
        bias = np.zeros((N, Tq, Tk), np.float32)
        valid = np.ones((N, Tk), bool)
        valid[0, 30:] = False
        got = np.asarray(flash_attention_bias(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias), jnp.asarray(valid),
            block_q=16, block_k=16,
        ))
        want = self._reference(q, k, v, bias, valid)
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestConvStackFused:
    """Fused conv-FE stack (ops/pallas_kernels.conv_stack_fused): the
    reference FE's strided middle layers (speech_encoder_prenet.py:278-374)
    in one kernel — per-tap matmuls over strided reshape views, on-chip
    GELU, recompute backward."""

    SPECS = ((3, 2), (3, 2), (2, 2))

    def _data(self, C=32, T=700, B=2, seed=0):
        from speecht5_tpu.ops import pallas_kernels as K

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        ws = tuple(
            jnp.asarray(rng.standard_normal((k, C, C)) * 0.05, jnp.float32)
            for k, _ in self.SPECS
        )
        return K, x, ws

    def test_forward_matches_xla_conv(self):
        K, x, ws = self._data()
        ref = K._conv_stack_ref(x, ws, self.SPECS)
        got = K.conv_stack_pallas(x, list(ws), self.SPECS, tile=16)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-4)

    def test_grads_match_reference(self):
        K, x, ws = self._data()

        def f(x, w):
            return (K.conv_stack_fused(x, w, self.SPECS, 16) ** 2).sum()

        def fr(x, w):
            return (K._conv_stack_ref(x, w, self.SPECS) ** 2).sum()

        gx, gw = jax.grad(f, argnums=(0, 1))(x, ws)
        rx, rw = jax.grad(fr, argnums=(0, 1))(x, ws)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=5e-4)
        for a, b in zip(gw, rw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)

    def test_ragged_length_and_bf16(self):
        """Lengths that don't divide the tile, bf16 activations."""
        K, x, ws = self._data(T=333)
        x16 = x.astype(jnp.bfloat16)
        ref = K._conv_stack_ref(x16, ws, self.SPECS)
        got = K.conv_stack_pallas(x16, list(ws), self.SPECS, tile=16)
        assert got.shape == ref.shape and got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2)

    def test_fe_module_impl_parity(self):
        """ConvFeatureExtractor(impl=pallas) == impl=xla: identical param
        tree, matching outputs and grads through the module surface."""
        from dataclasses import replace
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.prenets import ConvFeatureExtractor

        cfg = speecht5_tiny().conv_features
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        fe_x = ConvFeatureExtractor(replace(cfg, impl="xla"))
        fe_p = ConvFeatureExtractor(replace(cfg, impl="pallas"))
        vx = fe_x.init(jax.random.PRNGKey(0), wav)
        vp = fe_p.init(jax.random.PRNGKey(0), wav)
        assert (jax.tree_util.tree_structure(vx)
                == jax.tree_util.tree_structure(vp))
        ox = fe_x.apply(vx, wav)
        op = fe_p.apply(vx, wav)  # same params through both impls
        np.testing.assert_allclose(np.asarray(ox), np.asarray(op), atol=1e-4)
        gx = jax.grad(lambda v: (fe_x.apply(v, wav) ** 2).sum())(vx)
        gp = jax.grad(lambda v: (fe_p.apply(v, wav) ** 2).sum())(vx)
        for a, b in zip(jax.tree_util.tree_leaves(gx),
                        jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)
