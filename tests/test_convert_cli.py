"""Converter CLI: fairseq .pt -> orbax model dir -> restore round trip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.utils.checkpoint import CheckpointManager


def test_pt_to_orbax_round_trip(tmp_path):
    from speecht5_tpu.cli.convert import main as convert_main

    cfg = speecht5_tiny()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    # a partial fairseq checkpoint: just the rel-pos table and the CTC head
    M = cfg.encoder.rel_pos.max_distance
    pe = np.random.default_rng(0).standard_normal(
        (2 * M, cfg.encoder.head_dim)
    ).astype(np.float32)
    proj_w = np.random.default_rng(1).standard_normal(
        (cfg.vocab_size, cfg.d_model)
    ).astype(np.float32)
    sd = {
        "encoder.pos_emb.pe_k.weight": torch.tensor(pe),
        "encoder.proj.weight": torch.tensor(proj_w),
        "encoder.proj.bias": torch.zeros(cfg.vocab_size),
    }
    pt = tmp_path / "partial.pt"
    torch.save({"model": sd, "cfg": {}}, str(pt))

    out = tmp_path / "converted"
    report = convert_main([
        "--pt", str(pt), "--arch", "speecht5_tiny", "--out", str(out),
        "--vocab-size", str(cfg.vocab_size),
    ])
    assert not report["unknown_keys"]
    assert not report["shape_mismatches"]
    # missing params are expected (partial checkpoint) and kept at init
    assert report["missing_params"]

    restored, step = CheckpointManager(str(out)).restore_model(variables)
    assert step == 0
    np.testing.assert_allclose(
        np.asarray(restored["params"]["encoder"]["pos_emb"]["pe_k"]["embedding"]),
        pe, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(restored["params"]["encoder"]["proj"]["kernel"]),
        proj_w.T, rtol=1e-6,
    )
    # untouched params match the fresh init (partial_load keeps target)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["text_encoder_prenet"]["embed_tokens"]["embedding"]),
        np.asarray(variables["params"]["text_encoder_prenet"]["embed_tokens"]["embedding"]),
        rtol=1e-6,
    )


def test_hf_dir_to_orbax(tmp_path):
    """--format hf with a local save_pretrained directory: arch derived from
    the HF config, weights land in the orbax dir, decode-critical params
    survive the round trip."""
    from transformers import SpeechT5ForSpeechToText
    from tests.test_hf_parity import tiny_hf_config
    from speecht5_tpu.cli.convert import main as convert_main
    from speecht5_tpu.utils.convert_hf import hf_config_to_ours

    torch.manual_seed(0)
    hf = SpeechT5ForSpeechToText(tiny_hf_config())
    src = tmp_path / "hf_model"
    hf.save_pretrained(str(src), safe_serialization=False)

    out = tmp_path / "converted"
    report = convert_main([
        "--format", "hf", "--pt", str(src), "--out", str(out),
    ])
    assert not report["unknown_keys"]
    assert not report["shape_mismatches"]

    cfg = hf_config_to_ours(hf.config)
    _, variables = init_model(cfg, jax.random.PRNGKey(0))
    restored, step = CheckpointManager(str(out)).restore_model(variables)
    ref = hf.state_dict()["speecht5.encoder.wrapped_encoder.embed_positions.pe_k.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(restored["params"]["encoder"]["pos_emb"]["pe_k"]["embedding"]),
        ref, rtol=1e-6,
    )


def test_component_wavlm_to_orbax(tmp_path):
    """--component wavlm: a bare HF WavLM state-dict file converts into a
    params tree prefixed for WavLLMModel grafting; the pretrained weights
    survive the orbax round trip into an initialized WavLLM model."""
    from transformers import WavLMModel as HFWavLMModel
    from tests.test_wavllm_hf import tiny_wavlm_hf
    from speecht5_tpu.cli.convert import main as convert_main
    from speecht5_tpu.models.wavllm import WavLLMModel, wavllm_tiny
    from speecht5_tpu.utils.convert_components import wavlm_config_from_hf
    from speecht5_tpu.utils.checkpoint import partial_load

    torch.manual_seed(0)
    hf = HFWavLMModel(tiny_wavlm_hf())
    bin_path = tmp_path / "wavlm.bin"
    torch.save(hf.state_dict(), str(bin_path))

    out = tmp_path / "converted"
    report = convert_main([
        "--format", "hf", "--component", "wavlm", "--strict",
        "--pt", str(bin_path), "--out", str(out),
    ])
    assert not report["unknown_keys"]

    cfg = wavllm_tiny(wavlm=wavlm_config_from_hf(hf.config))
    model = WavLLMModel(cfg)
    mel = jnp.zeros((1, 8, cfg.n_mels), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), mel, jnp.asarray([8]),
        jnp.asarray([[5]]), jnp.asarray([[9]]),
        jnp.zeros((1, 400)), jnp.asarray([400]), method="forward_sft",
    )

    restored, step = CheckpointManager(str(out)).restore_model(
        {"params": {"wavlm": variables["params"]["wavlm"]}}
    )
    grafted = partial_load(variables["params"], restored["params"])
    np.testing.assert_allclose(
        np.asarray(grafted["wavlm"]["fp_projection"]["kernel"]),
        hf.state_dict()["feature_projection.projection.weight"].numpy().T,
        rtol=1e-6,
    )


@pytest.mark.slow
def test_parity_harness_dry_run(tmp_path):
    """cli.parity --dry-run: the convert->evaluate->diff plumbing produces a
    record per row and a summary, on random-init fixtures (the real matrix
    needs released checkpoints; BASELINE.md anchors)."""
    import json as _json

    from speecht5_tpu.cli.parity import main as parity_main

    res = tmp_path / "parity.json"
    records = parity_main([
        "--ckpt-dir", str(tmp_path / "ckpts"),
        "--data-dir", str(tmp_path / "data"),
        "--results", str(res), "--dry-run", "--batch-size", "4",
    ])
    assert len(records) == 1
    assert records[0]["status"] == "report_only"
    assert 0.0 <= records[0]["ours"] <= 1.5
    saved = _json.loads(res.read_text())
    assert saved["summary"]["rows"] == 1
    # the operating-point sweep ran the fast arms next to the beam
    assert set(records[0]["arms"]) == {"ctc_greedy", "ctc_rescore"}
    for arm in records[0]["arms"].values():
        assert 0.0 <= arm["wer"] <= 2.0
    # every real matrix row names its published source
    from speecht5_tpu.cli.parity import MATRIX
    assert all("source" in r and r["ckpt"].endswith(".pt") for r in MATRIX)


@pytest.mark.slow
def test_parity_harness_dry_run_base_geometry(tmp_path):
    """cli.parity --dry-run --dry-run-arch speecht5_base_asr: the whole
    convert->evaluate->diff chain once at the RELEASED geometry (VERDICT r4
    weak #1 — every other harness run was tiny), incl. the decoder-arm
    sweep.  Slow: full-size random init + base-geometry compiles on CPU."""
    import json as _json

    from speecht5_tpu.cli.parity import main as parity_main

    res = tmp_path / "parity_base.json"
    records = parity_main([
        "--ckpt-dir", str(tmp_path / "ckpts"),
        "--data-dir", str(tmp_path / "data"),
        "--results", str(res), "--dry-run", "--batch-size", "4",
        "--dry-run-arch", "speecht5_base_asr",
    ])
    assert len(records) == 1
    assert records[0]["status"] == "report_only"
    # random-init beam output can exceed WER 1.0 (insertions against the
    # 2-word refs); the gate is that the chain RUNS at base geometry and
    # reports finite numbers, not decode quality
    assert 0.0 <= records[0]["ours"] <= 4.0
    assert set(records[0]["arms"]) == {"ctc_greedy", "ctc_rescore"}
