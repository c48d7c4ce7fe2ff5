"""WavLLM data path: reference test_data TSV fixtures, LLaMA-2 chat prompt
template, Whisper feature-protocol parity vs HF WhisperFeatureExtractor.

Reference: WavLLM/wavllm/data/speechllm_dataset.py:145-240,298-324,419-431;
fixtures WavLLM/wavllm/test_data/{asr.tsv,audio/asr.flac} (expected outputs
documented in WavLLM/README.md:47-60)."""

import os

import numpy as np
import pytest

from speecht5_tpu.data import wavllm as wd

TEST_DATA = "/root/reference/WavLLM/wavllm/test_data"
HAVE_FIXTURES = os.path.exists(os.path.join(TEST_DATA, "asr.tsv"))


def byte_tokenize(text):
    """Deterministic BOS/EOS-free test tokenizer into the tiny vocab."""
    return [4 + (b % 40) for b in text.encode("utf-8")]


class TestWhisperMel:
    def test_hf_feature_extractor_parity(self):
        transformers = pytest.importorskip("transformers")
        fe = transformers.WhisperFeatureExtractor()
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
        ours = wd.whisper_log_mel(wav, pad_to_chunk=True)   # [3000, 80]
        theirs = fe(wav, sampling_rate=16000,
                    return_tensors="np")["input_features"][0].T
        assert ours.shape == theirs.shape == (3000, 80)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)

    def test_unpadded_frame_count(self):
        wav = np.zeros(16000, np.float32)
        mel = wd.whisper_log_mel(wav, pad_to_chunk=False)
        assert mel.shape == (100, wd.WHISPER_N_MELS)  # T // hop, last dropped

    def test_trims_beyond_chunk(self):
        wav = np.zeros(wd.WHISPER_CHUNK_SAMPLES + 50000, np.float32)
        assert wd.whisper_log_mel(wav).shape == (3000, wd.WHISPER_N_MELS)


class TestPromptTemplate:
    def test_strings(self):
        left, right = wd.prompt_strings("Transcribe the audio.")
        assert left == ("[INST]<<SYS>>\n" + wd.SYSTEM +
                        "\n<</SYS>>\n\n<SPEECH>")
        assert right == " </SPEECH> Transcribe the audio. [/INST]"


@pytest.mark.skipif(not HAVE_FIXTURES, reason="reference fixtures absent")
class TestReferenceFixtures:
    @pytest.fixture(scope="class")
    def ds(self):
        return wd.WavLLMDataset(
            os.path.join(TEST_DATA, "asr.tsv"), byte_tokenize,
            audio_root=os.path.join(TEST_DATA, "audio"),
            bos_id=1, eos_id=2, pad_id=0,
        )

    def test_row_parsing_and_audio(self, ds):
        assert len(ds) >= 1
        item = ds[0]
        # WavLLM/README.md documents the asr.flac transcription
        assert item["target_text"].startswith("he hoped there would be stew")
        assert item["wav"].shape[0] == 166960  # n_frames column
        # 166960 samples -> 1043 hop-160 frames, final frame dropped
        assert item["mel"].shape == (1043, wd.WHISPER_N_MELS)
        assert item["left_tokens"][0] == 1  # BOS on the left prompt only
        assert item["target_tokens"][-1] == 2  # EOS on the target

    def test_collate_matches_model_kwargs(self, ds):
        batch = ds.collate([ds[0]])
        assert set(batch) == {"mel", "mel_lengths", "wav", "wav_lengths",
                              "prompt_tokens", "left_tokens", "target_tokens"}
        assert batch["mel"].shape[0] == 1
        assert batch["mel_lengths"][0] == batch["mel"].shape[1]

    def test_tiny_model_sft_forward(self, ds):
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.wavllm import WavLLMModel, wavllm_tiny

        item = ds[0]
        # crop to 1 s so the tiny topology (max 64 source positions) fits
        item = dict(item, wav=item["wav"][:16000], mel=item["mel"][:100],
                    target_tokens=item["target_tokens"][:6])
        batch = {k: jnp.asarray(v) for k, v in ds.collate([item]).items()}

        cfg = wavllm_tiny(n_mels=wd.WHISPER_N_MELS)
        model = WavLLMModel(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), batch["mel"], batch["mel_lengths"],
            batch["prompt_tokens"], batch["target_tokens"], batch["wav"],
            batch["wav_lengths"], batch["left_tokens"], method="forward_sft",
        )
        logits, _gate = model.apply(
            variables, batch["mel"], batch["mel_lengths"],
            batch["prompt_tokens"], batch["target_tokens"], batch["wav"],
            batch["wav_lengths"], batch["left_tokens"], method="forward_sft",
        )
        assert logits.shape == (1, batch["target_tokens"].shape[1],
                                cfg.vocab_size)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_all_task_tsvs_parse(self):
        for name in ("sv", "emo", "SQA", "SQQA", "II-task", "CoT-task"):
            path = os.path.join(TEST_DATA, f"{name}.tsv")
            if not os.path.exists(path):
                continue
            rows = wd.load_wavllm_tsv(path)
            assert rows and "prompt" in rows[0] and "audio" in rows[0]
