"""Native EnCodec codec vs the in-image transformers.EncodecModel oracle.

The reference's codec families (VALL-E X, VioLA) emit RVQ tokens and defer
the codec to external torch EnCodec; models/encodec.py is the native
token->waveform (and waveform->token) path.  These tests build a tiny HF
EncodecModel on random init, convert its state dict, and require numerical
parity in both directions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speecht5_tpu.models.encodec import (
    EncodecConfig, EncodecModel, encodec_tiny, encodec_24khz, init_encodec,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = encodec_tiny()


@pytest.fixture(scope="module")
def hf_pair():
    """(hf_model, our_model, our_variables) on the SAME random weights."""
    from transformers import EncodecConfig as HFConfig
    from transformers import EncodecModel as HFModel
    from speecht5_tpu.utils.convert_hf import convert_encodec

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        audio_channels=1,
        num_filters=TINY.num_filters,
        num_residual_layers=TINY.num_residual_layers,
        upsampling_ratios=list(TINY.upsampling_ratios),
        codebook_size=TINY.codebook_size,
        codebook_dim=TINY.hidden_size,
        hidden_size=TINY.hidden_size,
        num_lstm_layers=TINY.num_lstm_layers,
        sampling_rate=TINY.sampling_rate,
        # num_quantizers is derived: 1000*max_bw // (frame_rate * nbits)
        target_bandwidths=[
            TINY.num_quantizers
            * (TINY.sampling_rate / TINY.hop_length)
            * np.log2(TINY.codebook_size) / 1000.0
        ],
        normalize=False,
    )
    hf = HFModel(hf_cfg).eval()
    assert hf_cfg.num_quantizers == TINY.num_quantizers, (
        hf_cfg.num_quantizers, TINY.num_quantizers)
    # random codebooks (HF inits them to zero)
    with torch.no_grad():
        for layer in hf.quantizer.layers:
            layer.codebook.embed.normal_()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = convert_encodec(sd, TINY)
    model = EncodecModel(TINY)
    return hf, model, variables


class TestDecoderParity:
    def test_decode_codes_matches_hf(self, hf_pair, rng):
        hf, model, variables = hf_pair
        B, T = 2, 12
        codes = rng.integers(0, TINY.codebook_size,
                             (B, TINY.num_quantizers, T))
        with torch.no_grad():
            # HF _decode_frame expects codes [B, n_q, T] -> transpose(0,1)
            emb = hf.quantizer.decode(
                torch.as_tensor(codes, dtype=torch.long).transpose(0, 1))
            want = hf.decoder(emb).squeeze(1).numpy()
        got = np.asarray(model.apply(
            variables, jnp.asarray(codes, jnp.int32), method="decode_codes"))
        assert got.shape == want.shape
        assert got.shape[-1] == T * TINY.hop_length
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

    def test_bandwidth_subset_of_quantizers(self, hf_pair, rng):
        """Decoding with fewer codebooks (lower bandwidth) also matches."""
        hf, model, variables = hf_pair
        codes = rng.integers(0, TINY.codebook_size, (1, 2, 9))
        with torch.no_grad():
            emb = hf.quantizer.decode(
                torch.as_tensor(codes, dtype=torch.long).transpose(0, 1))
            want = hf.decoder(emb).squeeze(1).numpy()
        got = np.asarray(model.apply(
            variables, jnp.asarray(codes, jnp.int32), method="decode_codes"))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


class TestEncoderParity:
    def test_encode_tokens_match_hf(self, hf_pair, rng):
        hf, model, variables = hf_pair
        B, T = 2, 6 * TINY.hop_length
        wav = (0.2 * rng.standard_normal((B, T))).astype(np.float32)
        with torch.no_grad():
            emb = hf.encoder(torch.as_tensor(wav)[:, None, :])
            want = hf.quantizer.encode(
                emb, bandwidth=None).transpose(0, 1).numpy()
        got = np.asarray(model.apply(
            variables, jnp.asarray(wav), method="encode"))
        assert got.shape == want.shape
        # nearest-neighbour ids must agree exactly except at numerical ties
        agree = (got == want).mean()
        assert agree > 0.99, f"only {agree:.3f} of ids agree"

    def test_roundtrip_reconstructs(self, hf_pair, rng):
        """encode -> decode is a sane autoencoder pass (finite, right shape)."""
        _, model, variables = hf_pair
        wav = (0.2 * rng.standard_normal((1, 4 * TINY.hop_length))
               ).astype(np.float32)
        codes = model.apply(variables, jnp.asarray(wav), method="encode")
        out = np.asarray(model.apply(variables, codes, method="decode_codes"))
        assert out.shape == wav.shape
        assert np.isfinite(out).all()


class TestStandalone:
    def test_init_and_jit(self):
        model, variables = init_encodec(TINY, jax.random.PRNGKey(0))
        codes = jnp.zeros((2, TINY.num_quantizers, 10), jnp.int32)
        wav = jax.jit(
            lambda v, c: model.apply(v, c, method="decode_codes")
        )(variables, codes)
        assert wav.shape == (2, 10 * TINY.hop_length)
        toks = jax.jit(
            lambda v, w: model.apply(v, w, method="encode")
        )(variables, wav)
        assert toks.shape == (2, TINY.num_quantizers, 10)

    def test_24khz_geometry(self):
        cfg = encodec_24khz()
        assert cfg.hop_length == 320
        assert abs(cfg.frame_rate - 75.0) < 1e-6
        assert cfg.num_quantizers == 32


class TestCodecComposition:
    def test_vallex_synthesis_decodes_to_waveform(self):
        """VALL-E X token output -> native codec -> waveform: the chain the
        reference advertises but never ships (README.md:24-28)."""
        from speecht5_tpu.models.vallex import vallex_tiny, init_vallex

        vcfg = vallex_tiny()
        vallex, v_vars = init_vallex(vcfg, jax.random.PRNGKey(0))
        phonemes = jnp.full((1, 4), 5, jnp.int32)
        prompt = jnp.zeros((1, vcfg.n_codebooks, 3), jnp.int32)
        codes, lengths = vallex.apply(
            v_vars, phonemes, prompt, max_new=8,
            rng=jax.random.PRNGKey(1), method="synthesize")
        ccfg = EncodecConfig(
            num_filters=4, hidden_size=8, codebook_size=vcfg.codebook_size,
            num_quantizers=vcfg.n_codebooks, upsampling_ratios=(4, 2),
            num_lstm_layers=1, sampling_rate=16000,
        )
        codec, c_vars = init_encodec(ccfg, jax.random.PRNGKey(2))
        wav = np.asarray(codec.apply(c_vars, codes, method="decode_codes"))
        assert wav.shape == (1, codes.shape[-1] * ccfg.hop_length)
        assert np.isfinite(wav).all()
