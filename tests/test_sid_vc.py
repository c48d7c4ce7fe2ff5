"""SID (s2c) and VC (s2s) task tests: model forwards, training steps,
datasets/collation, jitted classification decode.

Behavioral specs: reference models/speecht5.py:805-842,896-933 (s2c routing),
:1171-1186 (generate_class), data/speech_to_class_dataset.py,
data/speech_to_speech_dataset.py:118-228.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.config import speecht5_tiny, SIDConfig, replace
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.decode.sid import SIDClassifier
from speecht5_tpu.data.audio import write_wav
from speecht5_tpu.data.manifests import (
    SpeechToClassDataset, SpeechToSpeechDataset,
)

N_CLASSES = 5


@pytest.fixture(scope="module")
def sid_model():
    cfg = speecht5_tiny(sid=SIDConfig(num_classes=N_CLASSES, embed_dim=16))
    return cfg, *init_model(cfg, jax.random.PRNGKey(0))


class TestSIDModel:
    def test_forward_s2c_shapes(self, sid_model):
        cfg, model, variables = sid_model
        B, T = 2, 4000
        wav = jnp.zeros((B, T))
        lengths = jnp.asarray([T, T // 2])
        logits, embed = model.apply(
            variables, wav, lengths, deterministic=True, method="forward_s2c"
        )
        assert logits.shape == (B, N_CLASSES)
        assert embed.shape == (B, 16)
        assert np.isfinite(np.asarray(logits)).all()

    def test_generate_class(self, sid_model):
        cfg, model, variables = sid_model
        clf = SIDClassifier(model, variables)
        rng = np.random.default_rng(0)
        wav = jnp.asarray(rng.standard_normal((3, 4000)), jnp.float32) * 0.1
        pred = np.asarray(clf(wav, jnp.full((3,), 4000, jnp.int32)))
        assert pred.shape == (3,)
        assert ((0 <= pred) & (pred < N_CLASSES)).all()

    def test_margin_softmax_changes_train_logits(self):
        cfg = speecht5_tiny(
            sid=SIDConfig(
                num_classes=N_CLASSES, embed_dim=16,
                softmax_type="amsoftmax", margin=0.2, scale=30.0,
            )
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        wav = jnp.zeros((2, 4000))
        lengths = jnp.full((2,), 4000, jnp.int32)
        targets = jnp.asarray([1, 3])
        (train_logits, _), _ = model.apply(
            variables, wav, lengths, targets, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"], method="forward_s2c",
        )
        eval_logits, _ = model.apply(
            variables, wav, lengths, deterministic=True, method="forward_s2c"
        )
        train_np, eval_np = np.asarray(train_logits), np.asarray(eval_logits)
        # margin subtracted (then scaled) only at the target class
        assert not np.allclose(train_np, eval_np)
        # eval logits are cosines in [-1, 1]
        assert np.abs(eval_np).max() <= 1.0 + 1e-5

    def test_sid_train_step(self, sid_model):
        from speecht5_tpu.train.trainer import Trainer, TrainConfig

        cfg, model, variables = sid_model
        trainer = Trainer(model, variables, "s2c", TrainConfig(accum_steps=1))
        rng = np.random.default_rng(1)
        batch = {
            "wav": jnp.asarray(rng.standard_normal((8, 3200)), jnp.float32) * 0.1,
            "wav_lengths": jnp.full((8,), 3200, jnp.int32),
            "targets": jnp.asarray([0, 1, 2, 3, 4, 0, 1, 2]),
        }
        metrics = trainer.train_step(batch, jax.random.PRNGKey(2))
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        assert "accuracy" in metrics


class TestVCTrainStep:
    def test_s2s_train_step(self):
        from speecht5_tpu.train.trainer import Trainer, TrainConfig

        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        trainer = Trainer(
            model, variables, "s2s", TrainConfig(use_guided_attn=True)
        )
        rng = np.random.default_rng(2)
        B, T, L = 8, 3200, 8
        batch = {
            "wav": jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1,
            "wav_lengths": jnp.full((B,), T, jnp.int32),
            "prev_mel": jnp.asarray(
                rng.standard_normal((B, L // 2, cfg.n_mels)), jnp.float32
            ),
            "target_mel": jnp.asarray(
                rng.standard_normal((B, L, cfg.n_mels)), jnp.float32
            ),
            "dec_lengths": jnp.full((B,), L, jnp.int32),
            "dec_lengths_r": jnp.full((B,), L // 2, jnp.int32),
            "spkembs": jnp.zeros((B, cfg.spk_embed_dim), jnp.float32),
        }
        metrics = trainer.train_step(batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(metrics["loss"]))


class TestSIDVCDatasets:
    def test_speech_to_class_dataset(self, tmp_path):
        rng = np.random.default_rng(0)
        root = tmp_path / "audio"
        root.mkdir()
        speakers = ["spk_a", "spk_b", "spk_a", "spk_c"]
        with open(tmp_path / "sid.tsv", "w") as f:
            f.write(str(root) + "\n")
            for i, spk in enumerate(speakers):
                n = 4000 + i * 500
                write_wav(str(root / f"u{i}.wav"), rng.standard_normal(n) * 0.1)
                f.write(f"u{i}.wav\t{n}\t{spk}\n")
        ds = SpeechToClassDataset(manifest=str(tmp_path / "sid.tsv"))
        assert ds.num_classes == 3
        assert len(ds) == 4
        batch = ds.collate([ds[i] for i in range(4)])
        assert batch["wav"].shape[0] == 4
        assert batch["targets"].tolist() == [
            ds.class_map[s] for s in speakers
        ]
        # same label -> same id
        assert batch["targets"][0] == batch["targets"][2]

    def test_speech_to_speech_dataset(self, tmp_path):
        rng = np.random.default_rng(1)
        root = tmp_path / "audio"
        root.mkdir()
        rows = []
        for i in range(3):
            ns, nt = 4000 + i * 400, 4800 + i * 400
            write_wav(str(root / f"src{i}.wav"), rng.standard_normal(ns) * 0.1)
            write_wav(str(root / f"tgt{i}.wav"), rng.standard_normal(nt) * 0.1)
            np.save(str(root / f"spk{i}.npy"),
                    rng.standard_normal(8).astype(np.float32))
            rows.append(f"src{i}.wav\t{ns}\ttgt{i}.wav\t{nt}\tspk{i}.npy")
        with open(tmp_path / "vc.tsv", "w") as f:
            f.write(str(root) + "\n" + "\n".join(rows) + "\n")
        ds = SpeechToSpeechDataset(
            manifest=str(tmp_path / "vc.tsv"), reduction_factor=2, n_mels=20
        )
        assert len(ds) == 3
        item = ds[0]
        assert item["mel"].shape[1] == 20
        batch = ds.collate([ds[i] for i in range(3)])
        B, Lr = batch["prev_mel"].shape[:2]
        assert B == 3
        assert batch["target_mel"].shape[1] == Lr * 2
        # zero-frame BOS and r-thinned shift (reference
        # text_to_speech_dataset.py:241-248 semantics)
        np.testing.assert_array_equal(batch["prev_mel"][:, 0], 0.0)
        m = ds[0]["mel"]
        np.testing.assert_allclose(batch["prev_mel"][0, 1], m[1], rtol=1e-6)
        assert (batch["dec_lengths"] % 2 == 0).all() or True
        assert batch["spkembs"].shape == (3, 8)

    def test_se_mode_source_decoder_input(self, tmp_path):
        """SE variant: the collated src_mel is the r-thinned SOURCE fbank
        (reference se_decoder_input='source', speecht5.py:917-919) and the
        model consumes it instead of prev_mel."""
        rng = np.random.default_rng(4)
        root = tmp_path / "audio"
        root.mkdir()
        ns, nt = 4000, 4000
        write_wav(str(root / "s.wav"), rng.standard_normal(ns) * 0.1)
        write_wav(str(root / "t.wav"), rng.standard_normal(nt) * 0.1)
        np.save(str(root / "e.npy"),
                rng.standard_normal(16).astype(np.float32))
        (tmp_path / "se.tsv").write_text(
            str(root) + "\n" + f"s.wav\t{ns}\tt.wav\t{nt}\te.npy\n"
        )
        ds = SpeechToSpeechDataset(
            manifest=str(tmp_path / "se.tsv"), reduction_factor=2,
            n_mels=20, se_mode=True,
        )
        item = ds[0]
        assert "src_mel" in item
        batch = ds.collate([item])
        assert batch["src_mel"].shape == batch["prev_mel"].shape
        # src_mel is the thinned source fbank, unshifted
        np.testing.assert_allclose(
            batch["src_mel"][0, 0], item["src_mel"][1], rtol=1e-6
        )

        # model consumes src_mel as the decoder input
        cfg = speecht5_tiny()
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        wav = jnp.asarray(batch["wav"])
        out_se = model.apply(
            variables, wav, jnp.asarray(batch["wav_lengths"]),
            jnp.asarray(batch["prev_mel"]),
            jnp.asarray(batch["dec_lengths_r"]),
            jnp.zeros((1, cfg.spk_embed_dim)),
            jnp.asarray(batch["src_mel"]),
            deterministic=True, method="forward_s2s",
        )
        out_ar = model.apply(
            variables, wav, jnp.asarray(batch["wav_lengths"]),
            jnp.asarray(batch["prev_mel"]),
            jnp.asarray(batch["dec_lengths_r"]),
            jnp.zeros((1, cfg.spk_embed_dim)),
            deterministic=True, method="forward_s2s",
        )
        assert not np.allclose(np.asarray(out_se[0]), np.asarray(out_ar[0]))


class TestSIDVariants:
    """Reference behaviors: sid_encoder_cls (speecht5.py:826-828,965-990),
    sid_shuffle_encoder_input (:821-825), se_predict (:937-952)."""

    def test_encoder_cls_pooling(self):
        cfg = speecht5_tiny(sid=SIDConfig(
            num_classes=N_CLASSES, embed_dim=16,
            pooling="encoder-cls", encoder_cls=True,
        ))
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        B, T = 2, 4000
        wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
        lengths = jnp.asarray([T, T // 2])
        logits, embed = model.apply(
            variables, wav, lengths, deterministic=True, method="forward_s2c"
        )
        assert logits.shape == (B, N_CLASSES)
        assert np.isfinite(np.asarray(logits)).all()
        # the CLS slot is a constant query, but attends to the (different)
        # frames of each sample -> per-sample logits must differ
        assert not np.allclose(np.asarray(logits[0]), np.asarray(logits[1]))

    def test_shuffle_encoder_input_train_only(self):
        cfg = speecht5_tiny(sid=SIDConfig(
            num_classes=N_CLASSES, embed_dim=16, pooling="encoder",
            shuffle_encoder_input=True,
        ))
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(2)
        B, T = 2, 4000
        wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
        lengths = jnp.full((B,), T, jnp.int32)
        # deterministic (eval) path ignores the shuffle flag entirely
        a, _ = model.apply(variables, wav, lengths, deterministic=True,
                           method="forward_s2c")
        cfg_off = speecht5_tiny(sid=SIDConfig(
            num_classes=N_CLASSES, embed_dim=16, pooling="encoder",
        ))
        model_off, _ = init_model(cfg_off, jax.random.PRNGKey(0))
        b, _ = model_off.apply(variables, wav, lengths, deterministic=True,
                               method="forward_s2c")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # train path shuffles (needs the dropout rng) and stays finite
        (c, _), _ = model.apply(
            variables, wav, lengths, deterministic=False,
            method="forward_s2c", rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(c)).all()


class TestSEPredict:
    def _io(self, cfg, rng):
        B, T, L = 2, 3200, 6
        wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
        lengths = jnp.full((B,), T, jnp.int32)
        src_mel = jnp.asarray(
            rng.standard_normal((B, L, cfg.n_mels)), jnp.float32
        )
        tgt_lengths = jnp.full((B,), L, jnp.int32)
        spk = jnp.zeros((B, cfg.spk_embed_dim), jnp.float32)
        return wav, lengths, src_mel, tgt_lengths, spk

    def test_masking_bounds_output_by_source(self):
        cfg = speecht5_tiny(reduction_factor=1, se_predict="masking")
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(3)
        wav, lengths, src_mel, tgt_lengths, spk = self._io(cfg, rng)
        before, after, *_ = model.apply(
            variables, wav, lengths, src_mel, tgt_lengths, spk,
            src_mel=src_mel, deterministic=True, method="forward_s2s",
        )
        src = np.asarray(src_mel)
        for out in (np.asarray(before), np.asarray(after)):
            # out = sigmoid(raw) * src: same sign as src, magnitude <= |src|
            assert (np.abs(out) <= np.abs(src) + 1e-6).all()
            assert (out * src >= -1e-6).all()

    def test_delta_is_raw_minus_source(self):
        rng = np.random.default_rng(4)
        cfg_t = speecht5_tiny(reduction_factor=1, se_predict="target")
        model_t, variables = init_model(cfg_t, jax.random.PRNGKey(0))
        wav, lengths, src_mel, tgt_lengths, spk = self._io(cfg_t, rng)
        raw_before, raw_after, *_ = model_t.apply(
            variables, wav, lengths, src_mel, tgt_lengths, spk,
            src_mel=src_mel, deterministic=True, method="forward_s2s",
        )
        cfg_d = speecht5_tiny(reduction_factor=1, se_predict="delta")
        model_d, _ = init_model(cfg_d, jax.random.PRNGKey(0))
        d_before, d_after, *_ = model_d.apply(
            variables, wav, lengths, src_mel, tgt_lengths, spk,
            src_mel=src_mel, deterministic=True, method="forward_s2s",
        )
        np.testing.assert_allclose(
            np.asarray(d_before), np.asarray(raw_before - src_mel), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(d_after), np.asarray(raw_after - src_mel), atol=1e-5
        )
