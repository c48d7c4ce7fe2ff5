"""WavLLM tests: dual-encoder audio path, packed SFT forward, LoRA behavior,
LoRA-MoE gating, greedy generation, trainable-parameter filtering.

Behavioral spec: reference WavLLM/wavllm/models/speechllm_model.py:183-290,
models/llama.py:169-345, data/speechllm_dataset.py:145-163."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.models.wavllm import (
    WavLLMModel, wavllm_tiny, lora_param_filter,
)

B, TM, TW = 2, 24, 4000  # batch, mel frames, wav samples


def make_inputs(rng, cfg):
    mel = jnp.asarray(rng.standard_normal((B, TM, cfg.n_mels)), jnp.float32)
    mel_lengths = jnp.asarray([TM, TM - 8])
    wav = jnp.asarray(rng.standard_normal((B, TW)), jnp.float32) * 0.1
    wav_lengths = jnp.asarray([TW, TW // 2])
    prompt = jnp.asarray([[5, 6, 7], [5, 6, cfg.pad_id]])
    target = jnp.asarray([[9, 10, 11, 2], [9, 10, 2, cfg.pad_id]])
    return mel, mel_lengths, wav, wav_lengths, prompt, target


@pytest.fixture(scope="module")
def wavllm():
    rng = np.random.default_rng(0)
    cfg = wavllm_tiny()
    model = WavLLMModel(cfg)
    mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            mel, ml, prompt, target, wav, wl, method="forward_sft",
        )
    )()
    return cfg, model, variables


class TestWavLLMSFT:
    def test_forward_shapes_and_segments(self, wavllm, rng):
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        logits, gate = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        assert logits.shape == (B, target.shape[1], cfg.vocab_size)
        assert gate is None
        assert np.isfinite(np.asarray(logits)).all()

    def test_wavlm_branch_contributes(self, wavllm, rng):
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        with_wavlm, _ = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        without, _ = m.apply(
            v, mel, ml, prompt, target, None, None, method="forward_sft"
        )
        assert not np.allclose(np.asarray(with_wavlm), np.asarray(without))

    def test_lora_zero_init_is_identity(self, wavllm, rng):
        """Freshly initialized LoRA (B=0) must not change the base output:
        zeroing lora_A gives identical logits (reference zero-inits B)."""
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        base, _ = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        zeroed = jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.zeros_like(x)
            if "lora_A" in "/".join(str(k) for k in p) else x,
            v,
        )
        base2, _ = m.apply(
            zeroed, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(base2), atol=1e-5
        )

    def test_sft_loss_grads_only_touch_lora(self, wavllm, rng):
        """CE over the target segment; grads flow through LoRA params."""
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)

        def loss_fn(params):
            logits, _ = m.apply(
                {"params": params}, mel, ml, prompt, target, wav, wl,
                method="forward_sft",
            )
            valid = target != cfg.pad_id
            lp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(lp, target[..., None], -1)[..., 0]
            return (nll * valid).sum() / valid.sum()

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        # LoRA B grads are nonzero somewhere (A nonzero at init)
        gb = grads["llama_layers_0"]["wq"]["lora_B"]
        assert np.abs(np.asarray(gb)).sum() > 0

    def test_lora_param_filter(self, wavllm):
        cfg, m, v = wavllm
        flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        trainable = [p for p, _ in flat if lora_param_filter(
            tuple(getattr(k, "key", k) for k in p)
        )]
        names = {"/".join(str(getattr(k, "key", k)) for k in p)
                 for p in trainable}
        assert any("lora_A" in n for n in names)
        assert any("whisper_adapter" in n for n in names)
        assert not any("tok_embeddings" in n for n in names)


class TestWavLLMMoE:
    def test_moe_gate_mixes_experts(self, rng):
        cfg = wavllm_tiny(lora_moe=True, n_experts=3)
        m = WavLLMModel(cfg)
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        v = m.init({"params": jax.random.PRNGKey(1)},
                   mel, ml, prompt, target, wav, wl, method="forward_sft")
        logits, gate = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        assert gate.shape == (B, 3)
        np.testing.assert_allclose(np.asarray(gate).sum(-1), 1.0, rtol=1e-5)
        assert np.isfinite(np.asarray(logits)).all()


class TestWavLLMGenerate:
    def test_greedy_generate(self, wavllm, rng):
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, _ = make_inputs(rng, cfg)
        gen = jax.jit(lambda vv, *a: m.apply(vv, *a, max_new=6,
                                             method="generate"))
        toks = gen(v, mel, ml, prompt)
        toks2 = gen(v, mel, ml, prompt)
        assert toks.shape == (B, 6)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
        assert ((0 <= np.asarray(toks)) & (np.asarray(toks) < cfg.vocab_size)).all()


class TestWavLLMPacking:
    def test_prompt_padding_invariance(self, wavllm, rng):
        """Extra right-padding on the prompt must not change the target
        logits: pad slots are masked from attention, RoPE positions count
        real tokens only, and the first-target predictor tracks the last
        REAL prompt token."""
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        base, _ = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        padded_prompt = jnp.concatenate(
            [prompt, jnp.full((B, 2), cfg.pad_id, prompt.dtype)], axis=1
        )
        padded, _ = m.apply(
            v, mel, ml, padded_prompt, target, wav, wl, method="forward_sft"
        )
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(padded), atol=1e-4
        )

    def test_left_segment_changes_logits(self, wavllm, rng):
        """[left | audio | prompt | target] (reference llama.py:608-618):
        a system segment before the audio must influence the output."""
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, target = make_inputs(rng, cfg)
        base, _ = m.apply(
            v, mel, ml, prompt, target, wav, wl, method="forward_sft"
        )
        left = jnp.asarray([[3, 4], [3, 4]])
        with_left, _ = m.apply(
            v, mel, ml, prompt, target, wav, wl, left,
            method="forward_sft",
        )
        assert with_left.shape == base.shape
        assert not np.allclose(np.asarray(with_left), np.asarray(base))


class TestWavLLMBeam:
    def test_beam1_matches_greedy(self, wavllm, rng):
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, _ = make_inputs(rng, cfg)
        greedy = np.asarray(m.apply(v, mel, ml, prompt, max_new=6,
                                    method="generate"))
        beam, score = m.apply(v, mel, ml, prompt, beam_size=1, max_new=6,
                              method="generate_beam")
        beam = np.asarray(beam)
        # identical until greedy's first EOS (beam lanes freeze after EOS)
        for b in range(greedy.shape[0]):
            eos = np.where(greedy[b] == cfg.eos_id)[0]
            upto = (eos[0] + 1) if len(eos) else greedy.shape[1]
            np.testing.assert_array_equal(beam[b, :upto], greedy[b, :upto])
        assert np.isfinite(np.asarray(score)).all()

    def test_beam_search_runs_and_scores(self, wavllm, rng):
        cfg, m, v = wavllm
        mel, ml, wav, wl, prompt, _ = make_inputs(rng, cfg)
        gen = jax.jit(lambda vv, *a: m.apply(
            vv, *a, beam_size=4, max_new=6, method="generate_beam"
        ))
        toks, scores = gen(v, mel, ml, prompt)
        toks2, scores2 = gen(v, mel, ml, prompt)
        assert toks.shape == (B, 6)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
        assert np.isfinite(np.asarray(scores)).all()
        assert ((0 <= np.asarray(toks)) & (np.asarray(toks) < cfg.vocab_size)).all()
