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
            n_mels=26, stack_order=4, image_transform=False)
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
                             modalities=("audio",), stack_order=4,
                             image_transform=False)
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
            label_paths=[str(corpus / "train.km0")], stack_order=4,
            image_transform=False)
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
            n_mels=26, stack_order=1,  # tiny cfg: audio_feat_dim=26
            image_transform=False)
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


# ---------------------------------------------------------------------------
# Image-space pipeline (reference vathubert_dataset.py:220-231, utils.py:33-140)
# ---------------------------------------------------------------------------

from speecht5_tpu.data import video as vv


class TestVideoTransforms:
    def test_center_crop_geometry(self):
        x = np.zeros((2, 10, 12), np.float32)
        x[:, 4, 5] = 1.0  # near-center pixel
        y = vv.center_crop(x, (6, 6))
        assert y.shape == (2, 6, 6)
        assert y[0, 2, 2] == 1.0  # delta_h=2, delta_w=3

    def test_random_crop_bounds_and_shared_offset(self):
        rng = np.random.default_rng(0)
        x = np.arange(2 * 10 * 10, dtype=np.float32).reshape(2, 10, 10)
        y = vv.random_crop(x, (6, 6), rng)
        assert y.shape == (2, 6, 6)
        # one offset for the whole clip: frame delta is constant
        np.testing.assert_array_equal(y[1] - y[0], np.full((6, 6), 100.0))

    def test_flip_probability_and_orientation(self):
        x = np.zeros((1, 4, 4), np.float32)
        x[0, :, 0] = 1.0
        flipped = vv.horizontal_flip(
            x, 1.0, np.random.default_rng(0))
        assert (flipped[0, :, -1] == 1.0).all()
        same = vv.horizontal_flip(x, 0.0, np.random.default_rng(0))
        np.testing.assert_array_equal(same, x)

    def test_train_eval_transforms(self):
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (5, 96, 96)).astype(np.float32)
        tr = vv.train_transform(frames, np.random.default_rng(1))
        ev = vv.eval_transform(frames)
        assert tr.shape == (5, 88, 88) and ev.shape == (5, 88, 88)
        # Normalize(0,255) then (x - 0.421)/0.165: values land in a
        # predictable range
        assert -2.6 < ev.mean() < 2.6
        np.testing.assert_allclose(
            ev, (vv.center_crop(frames / 255.0, (88, 88)) - 0.421) / 0.165,
            rtol=1e-5)

    def test_crop_too_small_raises(self):
        with pytest.raises(ValueError, match="smaller"):
            vv.eval_transform(np.zeros((1, 50, 50), np.float32))


class TestY4M:
    def test_round_trip_mono_and_420(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (4, 24, 32)).astype(np.uint8)
        for chroma in ("mono", "420jpeg"):
            p = str(tmp_path / f"clip_{chroma}.y4m")
            vv.write_y4m(p, frames, chroma=chroma)
            back = vv.read_y4m(p)
            np.testing.assert_array_equal(back, frames)

    def test_max_frames(self, tmp_path):
        frames = np.zeros((6, 8, 8), np.uint8)
        p = str(tmp_path / "c.y4m")
        vv.write_y4m(p, frames)
        assert vv.read_y4m(p, max_frames=2).shape == (2, 8, 8)

    def test_rejects_non_y4m(self, tmp_path):
        p = tmp_path / "bad.y4m"
        p.write_bytes(b"RIFFxxxx\n")
        with pytest.raises(ValueError, match="YUV4MPEG2"):
            vv.read_y4m(str(p))


@pytest.fixture
def raw_corpus(tmp_path):
    """2 utterances with RAW [0,255] video: one .npy, one .y4m (24x24 ->
    cropped to 16 for vatlm_tiny's video_size)."""
    rng = np.random.default_rng(1)
    root = tmp_path / "raw"
    root.mkdir()
    n_video = [10, 8]
    man = [str(root)]
    labs = []
    for i, tv in enumerate(n_video):
        n_samp = tv * 640
        write_wav(str(root / f"u{i}.wav"), rng.standard_normal(n_samp) * 0.1)
        frames = rng.integers(0, 256, (tv, 24, 24)).astype(np.uint8)
        if i == 0:
            np.save(str(root / f"u{i}.npy"), frames)
            vid = f"u{i}.npy"
        else:
            vv.write_y4m(str(root / f"u{i}.y4m"), frames)
            vid = f"u{i}.y4m"
        man.append(f"u{i}\t{vid}\tu{i}.wav\t{n_samp}\textra")
        labs.append(" ".join(str(rng.integers(0, 20)) for _ in range(tv)))
    (tmp_path / "train.tsv").write_text("\n".join(man) + "\n")
    (tmp_path / "train.km").write_text("\n".join(labs) + "\n")
    return tmp_path


class TestImagePipeline:
    def _ds(self, corpus, **kw):
        return vd.VATLMDataset(
            str(corpus / "train.tsv"),
            label_paths=[str(corpus / "train.km")],
            n_mels=26, stack_order=1, image_crop_size=16, **kw)

    def test_eval_center_crop_default(self, raw_corpus):
        ds = self._ds(raw_corpus)
        it = ds[0]
        assert it["video"].shape == (10, 16, 16, 1)
        # deterministic: same item twice is identical
        np.testing.assert_array_equal(ds[0]["video"], it["video"])
        # y4m-backed item decodes too
        assert ds[1]["video"].shape == (8, 16, 16, 1)

    def test_train_aug_deterministic_per_epoch(self, raw_corpus):
        ds = self._ds(raw_corpus, image_aug=True, seed=5)
        a = ds[0]["video"]
        np.testing.assert_array_equal(ds[0]["video"], a)  # same epoch
        ds.set_epoch(1)
        b = ds[0]["video"]
        assert (a != b).any()  # new epoch -> new crop/flip
        assert a.shape == b.shape == (10, 16, 16, 1)

    def test_aug_flows_through_pretrain_and_avasr_decode(self, raw_corpus):
        """VERDICT r1 item 4 'done' gate: augmentation-on batches run
        through forward_pretrain and the AV-ASR beam decode."""
        import jax
        import jax.numpy as jnp
        from speecht5_tpu.models.vatlm import VATLMModel, vatlm_tiny
        from speecht5_tpu.train.criterions import hubert_loss
        from speecht5_tpu.decode.asr import ASRDecoder

        ds = self._ds(raw_corpus, image_aug=True, seed=3)
        batch = ds.collate([ds[0], ds[1]])
        cfg = vatlm_tiny()
        model = VATLMModel(cfg)
        audio = jnp.asarray(batch["audio"])
        video = jnp.asarray(batch["video"])
        lengths = jnp.asarray(batch["lengths"])
        rngs = {"params": jax.random.PRNGKey(0),
                "mask": jax.random.PRNGKey(1),
                "modality": jax.random.PRNGKey(2)}
        phones = jnp.full((2, 4), 5, jnp.int32)
        prev = jnp.full((2, 4), cfg.eos_id, jnp.int32)
        variables = model.init(
            rngs, audio, video, lengths, phones, prev, method="init_all")
        out, _ = model.apply(
            variables, audio, video, lengths, mask=True, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(3),
                  "modality": jax.random.PRNGKey(4),
                  "dropout": jax.random.PRNGKey(5)},
            mutable=["batch_stats"], method="forward_pretrain")
        T = audio.shape[1]
        tgt = jnp.asarray(batch["targets"][0][:, :T])
        loss, _ = hubert_loss(
            out["logits"], [tgt], out["time_mask"], out["valid_mask"])
        assert np.isfinite(float(loss))

        # eval-transform batch through the jitted AV-ASR beam decode
        ds_eval = self._ds(raw_corpus)
        b2 = ds_eval.collate([ds_eval[0], ds_eval[1]])
        dec = ASRDecoder(model, variables, beam_size=2, max_len=6,
                         encode_method="encode_av")
        res = dec(jnp.asarray(b2["audio"]), jnp.asarray(b2["video"]),
                  jnp.asarray(b2["lengths"]))
        assert np.isfinite(np.asarray(res.scores)).all()
