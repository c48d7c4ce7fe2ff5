"""VATLM audio-visual data path (reference
VATLM/vat_hubert/vathubert/data/vathubert_dataset.py: manifest loading
:42-82, frame stacking :262-276, AV alignment :291-296, collation
:377-497)."""

import numpy as np
import pytest

from speecht5_tpu.data import vatlm as vd
from speecht5_tpu.data.audio import write_wav


class TestStacker:
    def test_exact_multiple(self):
        x = np.arange(12, dtype=np.float32).reshape(6, 2)
        y = vd.stack_frames(x, 3)
        assert y.shape == (2, 6)
        np.testing.assert_array_equal(y[0], x[:3].reshape(-1))

    def test_remainder_zero_padded(self):
        x = np.ones((5, 2), np.float32)
        y = vd.stack_frames(x, 4)
        assert y.shape == (2, 8)
        # second stacked row: one real frame (2 values) + 3 zero frames
        np.testing.assert_array_equal(y[1], [1, 1, 0, 0, 0, 0, 0, 0])

    def test_identity_at_order_1(self):
        x = np.ones((5, 2), np.float32)
        assert vd.stack_frames(x, 1) is x


class TestFbank:
    def test_geometry(self):
        wav = np.random.default_rng(0).standard_normal(16000) * 0.1
        fb = vd.audio_fbank(wav, n_mels=26, stack_order=4)
        # 101 hop-160 frames -> ceil(101/4) = 26 stacked @ 104-dim
        assert fb.shape == (26, 104)


@pytest.fixture
def corpus(tmp_path):
    """3 synthetic AV utterances: wav + .npy lip-ROI video + 2 km streams."""
    rng = np.random.default_rng(0)
    root = tmp_path / "av"
    root.mkdir()
    n_video = [10, 14, 6]
    man = [str(root)]
    labs0, labs1 = [], []
    for i, tv in enumerate(n_video):
        n_samp = tv * 640  # 4 x 160-sample hops per 25 fps video frame
        write_wav(str(root / f"u{i}.wav"),
                  rng.standard_normal(n_samp) * 0.1)
        np.save(str(root / f"u{i}.npy"),
                rng.standard_normal((tv, 16, 16, 1)).astype(np.float32))
        man.append(f"u{i}\tu{i}.npy\tu{i}.wav\t{n_samp}\textra")
        labs0.append(" ".join(str(rng.integers(0, 20)) for _ in range(tv)))
        labs1.append(" ".join(str(rng.integers(0, 20)) for _ in range(tv)))
    (tmp_path / "train.tsv").write_text("\n".join(man) + "\n")
    (tmp_path / "train.km0").write_text("\n".join(labs0) + "\n")
    (tmp_path / "train.km1").write_text("\n".join(labs1) + "\n")
    return tmp_path


class TestDataset:
    def test_item_alignment_and_normalize(self, corpus):
        ds = vd.VATLMDataset(
            str(corpus / "train.tsv"),
            label_paths=[str(corpus / "train.km0"),
                         str(corpus / "train.km1")],
            n_mels=26, stack_order=4)
        assert len(ds) == 3
        it = ds[0]
        # audio trimmed/padded to the video length; stacked dim 104
        assert it["audio"].shape == (10, 104)
        assert it["video"].shape == (10, 16, 16, 1)
        assert it["labels_0"].shape == (10,) and it["labels_1"].shape == (10,)
        # per-frame layer norm: every frame has ~zero mean / unit std
        np.testing.assert_allclose(it["audio"].mean(-1), 0.0, atol=1e-4)
        np.testing.assert_allclose(it["audio"].std(-1), 1.0, atol=1e-2)

    def test_audio_only_modality(self, corpus):
        ds = vd.VATLMDataset(str(corpus / "train.tsv"),
                             modalities=("audio",), stack_order=4)
        it = ds[0]
        assert it["video"] is None and it["audio"] is not None

    def test_label_count_mismatch_raises(self, corpus):
        (corpus / "bad.km").write_text("1 2\n")
        with pytest.raises(ValueError, match="labels"):
            vd.VATLMDataset(str(corpus / "train.tsv"),
                            label_paths=[str(corpus / "bad.km")])

    def test_collate_pad_and_crop(self, corpus):
        ds = vd.VATLMDataset(
            str(corpus / "train.tsv"),
            label_paths=[str(corpus / "train.km0")], stack_order=4)
        items = [ds[i] for i in range(3)]
        batch = ds.collate(items)
        assert batch["audio"].shape == (3, 14, 104)
        assert batch["video"].shape == (3, 14, 16, 16, 1)
        assert batch["lengths"].tolist() == [10, 14, 6]
        # padded label slots are -1 (ignored by hubert_loss)
        assert (batch["targets"][0][2, 6:] == -1).all()

        cropped = ds.collate(items, max_frames=8, random_crop=True,
                             rng=np.random.default_rng(0))
        assert cropped["audio"].shape[1] == 8
        assert cropped["lengths"].max() == 8

    def test_pretrain_step_on_collated_batch(self, corpus):
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.vatlm import VATLMModel, vatlm_tiny
        from speecht5_tpu.train.criterions import hubert_loss

        ds = vd.VATLMDataset(
            str(corpus / "train.tsv"),
            label_paths=[str(corpus / "train.km0")],
            n_mels=26, stack_order=1)  # tiny cfg: audio_feat_dim=26
        batch = ds.collate([ds[0], ds[2]], max_frames=24, random_crop=False)
        cfg = vatlm_tiny()
        model = VATLMModel(cfg)
        audio = jnp.asarray(batch["audio"])
        video = jnp.asarray(batch["video"])
        lengths = jnp.asarray(batch["lengths"])
        rngs = {"params": jax.random.PRNGKey(0),
                "mask": jax.random.PRNGKey(1),
                "modality": jax.random.PRNGKey(2)}
        variables = model.init(
            rngs, audio, video, lengths, mask=True, deterministic=True,
            method="forward_pretrain")
        out, _ = model.apply(
            variables, audio, video, lengths, mask=True, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(3),
                  "modality": jax.random.PRNGKey(4),
                  "dropout": jax.random.PRNGKey(5)},
            mutable=["batch_stats"], method="forward_pretrain")
        # label streams are at the fused frame rate but batch labels may be
        # shorter than the padded T; pad to T with -1 like collate does
        T = audio.shape[1]
        tgt = jnp.asarray(batch["targets"][0][:, :T])
        loss, metrics = hubert_loss(
            out["logits"], [tgt], out["time_mask"], out["valid_mask"])
        assert np.isfinite(float(loss))
