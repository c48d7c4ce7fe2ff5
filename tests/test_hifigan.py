"""HiFi-GAN generator tests: transposed-conv parity vs torch, output shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.models.hifigan import (
    HiFiGANConfig, HiFiGANGenerator, WNConvTranspose1d, WNConv1d,
)


class TestConvParity:
    def test_transposed_conv_matches_torch(self, rng):
        import torch

        B, T, Cin, Cout, k, s = 2, 10, 4, 3, 8, 4
        p = (k - s) // 2
        x = rng.standard_normal((B, T, Cin)).astype(np.float32)

        mod = WNConvTranspose1d(Cout, k, stride=s, padding=p)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(mod.apply(v, jnp.asarray(x)))

        # reconstruct the effective torch weight from weight-norm params
        wv = np.asarray(v["params"]["weight_v"])  # [k, in, out]
        wg = np.asarray(v["params"]["weight_g"])  # [out]
        norm = np.sqrt((wv ** 2).sum(axis=(0, 1), keepdims=True))
        w = wg[None, None, :] * wv / norm
        w_torch = np.transpose(w, (1, 2, 0))      # [in, out, k]
        b = np.asarray(v["params"]["bias"])

        tconv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p)
        with torch.no_grad():
            tconv.weight.copy_(torch.tensor(w_torch))
            tconv.bias.copy_(torch.tensor(b))
            ref = tconv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()

        assert y.shape == ref.shape == (B, (T - 1) * s + k - 2 * p, Cout)
        np.testing.assert_allclose(y, ref, atol=1e-5)

    def test_dilated_conv_matches_torch(self, rng):
        import torch

        B, T, C, k, d = 2, 16, 4, 3, 5
        x = rng.standard_normal((B, T, C)).astype(np.float32)
        mod = WNConv1d(C, k, dilation=d)
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(mod.apply(v, jnp.asarray(x)))

        wv = np.asarray(v["params"]["weight_v"])
        wg = np.asarray(v["params"]["weight_g"])
        norm = np.sqrt((wv ** 2).sum(axis=(0, 1), keepdims=True))
        w = wg[None, None, :] * wv / norm
        w_torch = np.transpose(w, (2, 1, 0))  # [out, in, k]
        tconv = torch.nn.Conv1d(C, C, k, dilation=d, padding=(k - 1) * d // 2)
        with torch.no_grad():
            tconv.weight.copy_(torch.tensor(w_torch))
            tconv.bias.copy_(torch.tensor(np.asarray(v["params"]["bias"])))
            ref = tconv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()
        np.testing.assert_allclose(y, ref, atol=1e-5)


class TestGenerator:
    def test_upsample_factor_and_range(self, rng):
        cfg = HiFiGANConfig(
            in_dim=20,
            upsample_initial_channel=32,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        )
        gen = HiFiGANGenerator(cfg)
        mel = rng.standard_normal((2, 12, 20)).astype(np.float32)
        v = gen.init(jax.random.PRNGKey(0), jnp.asarray(mel))
        wav = np.asarray(gen.apply(v, jnp.asarray(mel)))
        assert wav.shape == (2, 12 * 16)
        assert np.abs(wav).max() <= 1.0
