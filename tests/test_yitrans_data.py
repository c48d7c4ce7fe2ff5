"""YiTrans data layer: multilingual denoising + langpair datasets.

Behavioral spec: reference YiTrans/yitrans_iwslt22/data/denoising_dataset.py
(DenoisingDatasetLang), load_langpair_dataset.py, lang_pair_mask_dataset.py,
tasks/iwslt_joint_pretraining.py:360-540."""

import numpy as np
import pytest

from speecht5_tpu.data.dictionary import Dictionary
from speecht5_tpu.data.text_noising import NoisingConfig
from speecht5_tpu.data.yitrans import (
    LangPairDataset,
    MultilingualDenoisingDataset,
    add_multilingual_symbols,
    lang_token,
)

LANGS = ["en_XX", "de_DE", "ja_XX"]


def make_dict(n_words=40):
    d = Dictionary()
    for i in range(n_words):
        d.add_symbol(f"w{i}")
    lang_ids = add_multilingual_symbols(d, LANGS)
    return d, lang_ids


def lines(n, lo=0, hi=40, ln=12, seed=0):
    rng = np.random.default_rng(seed)
    return [" ".join(f"w{i}" for i in rng.integers(lo, hi, ln))
            for _ in range(n)]


class TestMultilingualDenoising:
    def test_lang_tag_appended_to_both(self):
        d, lang_ids = make_dict()
        ds = MultilingualDenoisingDataset(
            lines(5), d, "de_DE", NoisingConfig(mask_ratio=0.3), seed=3
        )
        it = ds[0]
        # reference denoising_dataset.py:81-84: bos dropped, [lang] appended
        assert it["source"][-1] == lang_ids["de_DE"]
        assert it["target"][-1] == lang_ids["de_DE"]
        assert it["source"][0] != d.bos_index
        assert it["source"][-2] == d.eos_index
        assert it["target"][-2] == d.eos_index

    def test_without_lang_tag_keeps_bos_eos(self):
        d, _ = make_dict()
        ds = MultilingualDenoisingDataset(
            lines(3), d, "en_XX", seed=3, prepend_tgt_lang_tag=False
        )
        it = ds[0]
        assert it["source"][0] == d.bos_index
        assert it["source"][-1] == d.eos_index

    def test_noising_applied_and_target_clean(self):
        d, _ = make_dict()
        ds = MultilingualDenoisingDataset(
            lines(4, ln=30), d, "en_XX",
            NoisingConfig(mask_ratio=0.5), seed=1,
        )
        mask_id = d.index("<mask>")
        it = ds[1]
        assert (it["source"] == mask_id).any()
        assert not (it["target"] == mask_id).any()
        # target interior reproduces the raw line
        raw = np.asarray(d.encode_line(lines(4, ln=30)[1], append_eos=False))
        np.testing.assert_array_equal(it["target"][:-2], raw)

    def test_epoch_reseeds_deterministically(self):
        d, _ = make_dict()
        ds = MultilingualDenoisingDataset(
            lines(4, ln=30), d, "en_XX",
            NoisingConfig(mask_ratio=0.4), seed=7,
        )
        a = ds[2]["source"]
        b = ds[2]["source"]
        np.testing.assert_array_equal(a, b)  # same epoch -> identical
        ds.set_epoch(1)
        c = ds[2]["source"]
        assert len(a) != len(c) or (a != c).any()  # new epoch -> new noise

    def test_collate_prev_rotates_lang_to_front(self):
        d, lang_ids = make_dict()
        ds = MultilingualDenoisingDataset(lines(4), d, "ja_XX", seed=2)
        batch = ds.collate([ds[i] for i in range(3)], bucketed=False)
        # decoder BOS is the language tag (mBART convention via
        # move_eos_to_beginning of the appended tag)
        assert (batch["prev_tokens"][:, 0] == lang_ids["ja_XX"]).all()
        for b in range(3):
            L = batch["target_lengths"][b]
            np.testing.assert_array_equal(
                batch["prev_tokens"][b, 1:L], batch["targets"][b, : L - 1]
            )
        assert batch["src_tokens"].shape[0] == 3

    def test_requires_mask_symbol(self):
        d = Dictionary()
        for i in range(10):
            d.add_symbol(f"w{i}")
        with pytest.raises(AssertionError, match="mask"):
            MultilingualDenoisingDataset(lines(2, hi=10), d, "en_XX",
                                         prepend_tgt_lang_tag=False)


class TestLangPair:
    def _pair(self, **kw):
        d, lang_ids = make_dict()
        src = lines(6, ln=8, seed=1)
        tgt = lines(6, ln=10, seed=2)
        return d, lang_ids, LangPairDataset(
            src, tgt, d, d, "en_XX", "de_DE", **kw
        )

    def test_append_source_id(self):
        d, lang_ids, ds = self._pair(append_source_id=True)
        it = ds[0]
        # reference load_langpair_dataset.py:137-146: [lang] after the eos
        assert it["source"][-1] == lang_ids["en_XX"]
        assert it["source"][-2] == d.eos_index
        assert it["target"][-1] == lang_ids["de_DE"]
        batch = ds.collate([ds[i] for i in range(2)], bucketed=False)
        assert (batch["prev_tokens"][:, 0] == lang_ids["de_DE"]).all()

    def test_transform_eos_prev_bos(self):
        """Fine-tune path: prev starts with [tgt] replacing the rotated EOS
        (reference iwslt_translation_from_pretrain.py:198-205)."""
        d, lang_ids, ds = self._pair(append_source_id=False)
        it = ds[0]
        assert it["source"][-1] == d.eos_index  # no appended tag
        batch = ds.collate([ds[i] for i in range(2)], bucketed=False)
        assert (batch["prev_tokens"][:, 0] == lang_ids["de_DE"]).all()
        L = batch["target_lengths"][0]
        np.testing.assert_array_equal(
            batch["prev_tokens"][0, 1:L], batch["targets"][0, : L - 1]
        )

    def test_source_masking(self):
        d, lang_ids, ds = self._pair(append_source_id=True,
                                     mask_text_ratio=0.5)
        mask_id = d.index("<mask>")
        it = ds[0]
        assert (it["source"] == mask_id).any()
        # eos and lang tag spared (reference mask_src_tokens spares bos/eos)
        assert it["source"][-1] == lang_ids["en_XX"]
        assert it["source"][-2] == d.eos_index
        # target never masked
        assert not (it["target"] == mask_id).any()

    def test_deterministic_masking(self):
        _, _, a = self._pair(append_source_id=True, mask_text_ratio=0.3)
        _, _, b = self._pair(append_source_id=True, mask_text_ratio=0.3)
        np.testing.assert_array_equal(a[3]["source"], b[3]["source"])

    def test_sizes_for_token_batching(self):
        _, _, ds = self._pair(append_source_id=True)
        assert len(ds.sizes) == 6
        assert (ds.sizes >= ds.src_sizes).all()
        assert (ds.sizes >= ds.tgt_sizes).all()


class TestYiTransTaskWiring:
    """Joint pretrain step through MultiCorpusLoader + make_yitrans_pretrain_loss
    (reference tasks/iwslt_joint_pretraining.py:360-540 composition)."""

    def test_pretrain_step_and_mt_finetune(self):
        import jax
        import jax.numpy as jnp
        import optax
        from speecht5_tpu.data.multicorpus import (
            MultiCorpusLoader, TokenCorpusSpec,
        )
        from speecht5_tpu.models.yitrans import YiTransModel, yitrans_tiny
        from speecht5_tpu.train.joint import (
            JointLossConfig, make_yitrans_pretrain_loss,
        )
        from speecht5_tpu.train.criterions import label_smoothed_ce

        d, lang_ids = make_dict()
        cfg = yitrans_tiny(vocab_size=len(d))
        model = YiTransModel(cfg)
        rng = np.random.default_rng(0)
        T_WAV = 2000
        frames = cfg.conv_features.out_length(T_WAV)
        speech_ds = [{
            "wav": rng.standard_normal(T_WAV).astype(np.float32) * 0.1,
            "units": rng.integers(0, cfg.unit_vocab_size, frames, np.int64),
        } for _ in range(6)]

        def collate_speech(items):
            return {
                "wav": jnp.stack([jnp.asarray(x["wav"]) for x in items]),
                "wav_lengths": jnp.full((len(items),), T_WAV, jnp.int32),
                "units": jnp.stack(
                    [jnp.asarray(x["units"], jnp.int32) for x in items]),
            }

        mono = MultilingualDenoisingDataset(
            lines(8, ln=10), d, "de_DE", seed=1)

        def collate_mono(items):
            return {k: jnp.asarray(v)
                    for k, v in mono.collate(items, bucketed=False).items()}

        loader = MultiCorpusLoader([
            TokenCorpusSpec("speech", speech_ds, collate_speech,
                            np.full(6, T_WAV), sample_ratio=6 / 14),
            TokenCorpusSpec("text_mono", mono, collate_mono, mono.sizes,
                            sample_ratio=8 / 14,
                            max_tokens_ratio=(2 * 13) / (2 * T_WAV)),
        ], max_tokens=2 * T_WAV, seed=1)

        tokens0 = jnp.full((1, 4), 5, jnp.int32)
        variables = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jnp.zeros((1, T_WAV)), jnp.full((1,), T_WAV), tokens0, tokens0,
            method="init_all"))()
        loss_fn = make_yitrans_pretrain_loss(model, JointLossConfig())
        _, joint = next(iter(loader.iter_epoch(0)))
        assert set(joint) == {"speech", "text_mono"}
        loss, metrics = loss_fn(
            variables["params"], joint, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert "denoise_loss" in metrics

        # MT fine-tune: loss decreases over a few steps on a fixed batch
        pairs = LangPairDataset(
            lines(4, ln=6, seed=5), lines(4, ln=6, seed=6), d, d,
            "en_XX", "de_DE", append_source_id=False,
        )
        batch = {k: jnp.asarray(v) for k, v in
                 pairs.collate([pairs[i] for i in range(4)],
                               bucketed=False).items()}
        tx = optax.adam(5e-3)
        params = variables["params"]
        opt = tx.init(params)

        def mt_loss(p, b):
            logits = model.apply({"params": p}, b["src_tokens"],
                                 b["prev_tokens"], deterministic=True,
                                 method="forward_mt")
            valid = b["targets"] != cfg.pad_id
            ce, _ = label_smoothed_ce(
                logits.astype(jnp.float32), b["targets"], valid, 0.0)
            return ce

        step = jax.jit(lambda p, o, b: _mt_step(p, o, b))

        def _mt_step(p, o, b):
            l, g = jax.value_and_grad(mt_loss)(p, b)
            up, o = tx.update(g, o, p)
            return optax.apply_updates(p, up), o, l

        losses = []
        for _ in range(6):
            params, opt, l = step(params, opt, batch)
            losses.append(float(l))
        assert losses[-1] < losses[0]
