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


class TestHiFiGANConverter:
    def test_torch_generator_parity(self, rng):
        """Full-generator oracle: build a torch HiFi-GAN (weight-normed convs,
        transposed-conv upsampling, MRF resblocks, HF-style mel normalization),
        export an HF-named state dict, convert with convert_hifigan_state_dict,
        assert waveform parity."""
        import torch
        import torch.nn.functional as F
        from torch.nn.utils import weight_norm
        from speecht5_tpu.utils.convert import convert_hifigan_state_dict

        torch.manual_seed(0)
        C0, MELS = 16, 8
        rates, ks = (4, 2), (8, 4)
        rks, rds = (3,), ((1, 3),)
        slope = 0.1

        conv_pre = weight_norm(torch.nn.Conv1d(MELS, C0, 7, padding=3))
        ups, resblocks = torch.nn.ModuleList(), torch.nn.ModuleList()
        ch = C0
        for r, k in zip(rates, ks):
            ups.append(weight_norm(torch.nn.ConvTranspose1d(
                ch, ch // 2, k, stride=r, padding=(k - r) // 2)))
            ch //= 2
            for rk, rd in zip(rks, rds):
                block = torch.nn.ModuleDict({
                    "convs1": torch.nn.ModuleList([
                        weight_norm(torch.nn.Conv1d(
                            ch, ch, rk, dilation=d, padding=(rk - 1) * d // 2))
                        for d in rd
                    ]),
                    "convs2": torch.nn.ModuleList([
                        weight_norm(torch.nn.Conv1d(
                            ch, ch, rk, padding=(rk - 1) // 2))
                        for _ in rd
                    ]),
                })
                resblocks.append(block)
        conv_post = weight_norm(torch.nn.Conv1d(ch, 1, 7, padding=3))
        mel_mean = torch.randn(MELS)
        mel_scale = torch.rand(MELS) + 0.5

        def torch_forward(mel):  # [B, T, MELS]
            x = ((mel - mel_mean) / mel_scale).transpose(1, 2)
            x = conv_pre(x)
            for i in range(len(rates)):
                x = F.leaky_relu(x, slope)
                x = ups[i](x)
                acc = None
                for j in range(len(rks)):
                    block = resblocks[i * len(rks) + j]
                    y = x
                    for c1, c2 in zip(block["convs1"], block["convs2"]):
                        h = c1(F.leaky_relu(y, slope))
                        h = c2(F.leaky_relu(h, slope))
                        y = y + h
                    acc = y if acc is None else acc + y
                x = acc / len(rks)
            x = F.leaky_relu(x, slope)
            return torch.tanh(conv_post(x))[:, 0]

        mel = torch.tensor(
            rng.standard_normal((2, 6, MELS)).astype(np.float32)
        )
        with torch.no_grad():
            want = torch_forward(mel).numpy()

        sd = {k: v.detach().numpy()
              for k, v in torch.nn.ModuleDict({
                  "conv_pre": conv_pre, "conv_post": conv_post,
                  "upsampler": ups, "resblocks": resblocks,
              }).state_dict().items()}
        sd["mean"] = mel_mean.numpy()
        sd["scale"] = mel_scale.numpy()

        params = convert_hifigan_state_dict(sd)
        cfg = HiFiGANConfig(
            in_dim=MELS, upsample_initial_channel=C0,
            upsample_rates=rates, upsample_kernel_sizes=ks,
            resblock_kernel_sizes=rks, resblock_dilations=rds,
        )
        gen = HiFiGANGenerator(cfg)
        got = np.asarray(gen.apply({"params": params}, jnp.asarray(mel.numpy())))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


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

    def test_tts_decoder_with_vocoder(self):
        """TTSDecoder returns waveform when a vocoder is attached; the wav is
        the vocoder applied to the refined mel, in one jitted program."""
        from speecht5_tpu.config import speecht5_tiny
        from speecht5_tpu.models.speecht5 import init_model
        from speecht5_tpu.decode.tts import TTSDecoder

        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        vcfg = HiFiGANConfig(
            in_dim=cfg.n_mels, upsample_initial_channel=16,
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        )
        voc = HiFiGANGenerator(vcfg)
        vvars = voc.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4, cfg.n_mels))
        )
        tts = TTSDecoder(
            model, variables, max_frames=16,
            vocoder=voc, vocoder_variables=vvars,
        )
        out = tts.text_to_speech(
            jnp.asarray([[5, 6, 7, 2]]), jnp.zeros((1, cfg.spk_embed_dim))
        )
        assert out.wav is not None
        assert out.wav.shape == (1, out.mel.shape[1] * 8)  # 4*2 upsampling
        # focus rate (reference generate_speech.py:54-66): a valid attention
        # max-prob average, in (0, 1]
        fr = float(out.focus_rate[0])
        assert 0.0 < fr <= 1.0 + 1e-6
        assert int(out.wav_lengths[0]) == int(out.lengths[0]) * 8
        # waveform equals the vocoder applied to the refined mel
        direct = voc.apply(vvars, out.mel)
        np.testing.assert_allclose(
            np.asarray(out.wav), np.asarray(direct), atol=1e-5
        )


class TestCodeHiFiGAN:
    """Unit-conditioned vocoder (the Speech2S S2ST chain's unit HiFi-GAN,
    reference Speech2S/speech2s/stpretrain_scripts/eval2.sh)."""

    def _cfg(self, dur):
        from speecht5_tpu.models.hifigan import (
            CodeHiFiGANConfig, HiFiGANConfig,
        )

        return CodeHiFiGANConfig(
            num_units=12, embed_dim=16, dur_predictor=dur, max_duration=3,
            generator=HiFiGANConfig(
                in_dim=16, upsample_initial_channel=32,
                upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
                normalize_before=False,
            ),
        )

    def test_frame_level_units_to_waveform(self, rng):
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.hifigan import CodeHiFiGAN

        m = CodeHiFiGAN(self._cfg(dur=False))
        u = jnp.asarray(rng.integers(0, 12, (2, 6)), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), u)
        wav = np.asarray(m.apply(v, u))
        assert wav.shape == (2, 6 * 8)  # hop = 4*2
        assert np.isfinite(wav).all()

    def test_duration_expansion_and_padding_mask(self, rng):
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.hifigan import CodeHiFiGAN

        m = CodeHiFiGAN(self._cfg(dur=True))
        u = jnp.asarray([[3, 4, 5, 1]], jnp.int32)
        valid = jnp.asarray([[True, True, True, False]])
        v = m.init(jax.random.PRNGKey(0), u, valid)
        wav = np.asarray(m.apply(v, u, valid))
        # static output: T * max_duration * hop
        assert wav.shape == (1, 4 * 3 * 8)
        assert np.isfinite(wav).all()
        # a padding unit's id must not influence the waveform
        u2 = u.at[0, 3].set(9)
        wav2 = np.asarray(m.apply(v, u2, valid))
        np.testing.assert_allclose(wav, wav2, atol=1e-6)
        # but a VALID unit's id must
        u3 = u.at[0, 1].set(9)
        wav3 = np.asarray(m.apply(v, u3, valid))
        assert np.abs(wav3 - wav).max() > 1e-4
