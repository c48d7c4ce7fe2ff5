"""VioLA: unified multi-task codec LM (models/viola.py; arXiv 2305.16107 —
advertised in reference README.md:24-28 with no code in-tree, built from
the paper).  Covers the shared token space, target-masked LM loss,
multi-task learning + constrained generation, and the NAR acoustic stage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speecht5_tpu.models.viola import (
    VioLAModel, VioLAConfig, viola_tiny, build_example, init_viola, TASKS,
)


@pytest.fixture(scope="module")
def vio():
    cfg = viola_tiny()
    model, variables = init_viola(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


class TestTokenSpace:
    def test_layout_disjoint(self):
        cfg = viola_tiny()
        blocks = [
            (cfg.task0, cfg.task0 + len(TASKS)),
            (cfg.lang0, cfg.lang0 + cfg.n_langs),
            (cfg.text0, cfg.text0 + cfg.text_vocab),
            (cfg.unit0, cfg.unit0 + cfg.unit_vocab),
            (cfg.code0, cfg.code0 + cfg.codebook_size),
        ]
        for (a0, a1), (b0, b1) in zip(blocks, blocks[1:]):
            assert a1 == b0  # contiguous, disjoint
        assert blocks[-1][1] == cfg.total_vocab
        assert cfg.pad_id < cfg.task0 and cfg.sep_id < cfg.task0

    def test_build_example(self):
        cfg = viola_tiny()
        src = [cfg.unit0 + 1, cfg.unit0 + 2]
        tgt = [cfg.text0 + 3]
        toks, mask = build_example(cfg, "asr", 1, src, tgt, 10)
        want = [cfg.lang_id(1), cfg.task_id("asr"), *src, cfg.sep_id,
                *tgt, cfg.eos_id, cfg.pad_id, cfg.pad_id, cfg.pad_id]
        np.testing.assert_array_equal(toks, want)
        # supervised tokens: the target segment + the closing eos
        np.testing.assert_array_equal(
            np.nonzero(mask)[0], [5, 6])


class TestLMLoss:
    def test_loss_is_target_masked_ce(self, vio):
        cfg, m, v = vio
        src = [cfg.unit0 + u for u in (1, 2, 3)]
        tgt = [cfg.text0 + t for t in (4, 5)]
        toks, mask = build_example(cfg, "asr", 0, src, tgt, 12)
        tb, mb = jnp.asarray(toks[None]), jnp.asarray(mask[None])
        loss = float(m.apply(v, tb, mb, method="lm_loss"))
        logits = np.asarray(m.apply(v, tb))
        lp = jax.nn.log_softmax(jnp.asarray(logits[:, :-1]), -1)
        nll = -np.take_along_axis(
            np.asarray(lp), toks[None, 1:, None], axis=-1)[..., 0]
        w = mask[None, 1:]
        np.testing.assert_allclose(loss, nll[w].mean(), rtol=1e-5)

    def test_source_positions_unsupervised(self, vio):
        """Changing an unsupervised continuation beyond eos (padding) must
        not change the loss; changing a target token must."""
        cfg, m, v = vio
        src = [cfg.unit0 + 1, cfg.unit0 + 2]
        tgt = [cfg.text0 + 3, cfg.text0 + 4]
        toks, mask = build_example(cfg, "mt", 0, src, tgt, 12)
        tb, mb = jnp.asarray(toks[None]), jnp.asarray(mask[None])
        base = float(m.apply(v, tb, mb, method="lm_loss"))
        pad_region = toks.copy()
        pad_region[-1] = cfg.text0 + 9  # padding slot, not supervised,
        #                                 not attended (pad mask keys off id
        #                                 == pad, so use mask to keep valid)
        tgt_mut = toks.copy()
        tgt_mut[6] = cfg.text0 + 9      # a target token
        assert float(m.apply(v, jnp.asarray(tgt_mut[None]), mb,
                             method="lm_loss")) != pytest.approx(base)


class TestMultiTask:
    def test_learns_all_tasks_and_generates(self, vio):
        """Deterministic per-task mappings learned by ONE model; greedy
        generation recovers the ASR mapping and the TTS generation is
        range-constrained to acoustic codes."""
        cfg, m, v = vio
        rng = np.random.default_rng(0)
        L = 14

        def asr_ex(i):
            us = rng.integers(0, cfg.unit_vocab, 3)
            src = [cfg.unit0 + int(u) for u in us]
            tgt = [cfg.text0 + int(u) % cfg.text_vocab for u in us]
            return build_example(cfg, "asr", 0, src, tgt, L)

        def mt_ex(i):
            ts = rng.integers(0, cfg.text_vocab, 3)
            src = [cfg.text0 + int(t) for t in ts]
            tgt = [cfg.text0 + (int(t) + 1) % cfg.text_vocab for t in ts]
            return build_example(cfg, "mt", 1, src, tgt, L)

        def tts_ex(i):
            ts = rng.integers(0, cfg.text_vocab, 2)
            src = [cfg.text0 + int(t) for t in ts]
            tgt = [cfg.code0 + int(t) % cfg.codebook_size for t in ts]
            return build_example(cfg, "tts", 0, src, tgt, L)

        rows = [f(i) for i in range(8) for f in (asr_ex, mt_ex, tts_ex)]
        toks = jnp.asarray(np.stack([r[0] for r in rows]))
        mask = jnp.asarray(np.stack([r[1] for r in rows]))

        params = v["params"]
        tx = optax.adamw(5e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            loss, g = jax.value_and_grad(
                lambda pp: m.apply({"params": pp}, toks, mask,
                                   method="lm_loss"))(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        first = None
        for _ in range(250):
            params, opt, loss = step(params, opt)
            first = float(loss) if first is None else first
        assert float(loss) < first / 8, (first, float(loss))

        # ASR generation on a TRAINING row (memorization check): prefix up
        # to <sep>, the greedy continuation must equal its target + eos
        row0 = np.asarray(rows[0][0])
        sep_pos = int(np.nonzero(row0 == cfg.sep_id)[0][0])
        eos_pos = int(np.nonzero(row0 == cfg.eos_id)[0][0])
        want = row0[sep_pos + 1 : eos_pos + 1].tolist()
        prefix = row0[None, : sep_pos + 1].astype(np.int32)
        out, lengths = m.apply(
            {"params": params}, jnp.asarray(prefix), max_new=6,
            method="generate")
        got = np.asarray(out)[0][: len(want)]
        np.testing.assert_array_equal(got, want)

        # TTS generation on a TRAINING row, constrained to the acoustic
        # block of the shared space
        tts_row = np.asarray(rows[2][0])
        sep_pos = int(np.nonzero(tts_row == cfg.sep_id)[0][0])
        eos_pos = int(np.nonzero(tts_row == cfg.eos_id)[0][0])
        want_codes = tts_row[sep_pos + 1 : eos_pos].tolist()
        prefix = tts_row[None, : sep_pos + 1].astype(np.int32)
        out, lengths = m.apply(
            {"params": params}, jnp.asarray(prefix), max_new=5,
            method="generate",
            allowed_range=(cfg.code0, cfg.code0 + cfg.codebook_size))
        got = np.asarray(out)[0]
        n = int(np.asarray(lengths)[0])
        assert ((got[:n] >= cfg.code0)
                & (got[:n] < cfg.code0 + cfg.codebook_size)).all()
        np.testing.assert_array_equal(got[: len(want_codes)], want_codes)


class TestNAR:
    def test_stage_logits_and_sensitivity(self, vio):
        cfg, m, v = vio
        toks = jnp.full((2, 8), cfg.eos_id, jnp.int32)
        codes = jnp.zeros((2, cfg.n_codebooks, 5), jnp.int32)
        l1 = m.apply(v, toks, codes, 1, method="nar_logits")
        l2 = m.apply(v, toks, codes, 2, method="nar_logits")
        assert l1.shape == (2, 5, cfg.codebook_size)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))
