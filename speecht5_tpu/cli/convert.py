"""Convert a released SpeechT5 checkpoint into an orbax model dir usable by
the evaluate/train CLIs (--ckpt / --finetune-from).

Two source formats:
  fairseq  — the original .pt files (reference models/speecht5.py:1022-1058;
             namespace map in SURVEY.md 3.5)
  hf       — transformers checkpoints (microsoft/speecht5_{asr,tts,vc}): a
             local directory / model id loadable by from_pretrained, or a
             pytorch_model.bin state-dict file

Usage:
    python -m speecht5_tpu.cli.convert --pt speecht5_base_asr.pt \
        --arch speecht5_base_asr --dict dict.txt --out ckpt_converted/

    python -m speecht5_tpu.cli.convert --format hf --pt ./speecht5_asr/ \
        --out ckpt_converted/        # arch/dims derived from the HF config

WavLLM's pretrained components (reference speechllm_model.py:183-278 builds
on released Whisper / WavLM / LLaMA checkpoints) convert individually with
--component; the result is a params tree shaped for grafting into
WavLLMModel via partial_load (WavLM under ``wavlm/``, Whisper under
``whisper/``, LLaMA at the trunk's top level):

    python -m speecht5_tpu.cli.convert --format hf --component wavlm \
        --pt ./wavlm-base-plus/ --out wavlm_converted/

Unknown keys are listed, shape mismatches raise (with --strict).
"""

from __future__ import annotations

import argparse
import json
import os


def _load_hf(path: str):
    """Returns (cfg_or_None, converted variables, unknown keys)."""
    from ..utils.convert_hf import load_hf_checkpoint, convert_hf_state_dict

    if os.path.isfile(path):  # bare torch state-dict file
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd_np = {k: v.numpy() for k, v in sd.items()}
        params, batch_stats, unknown = convert_hf_state_dict(sd_np)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return None, variables, unknown

    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(path)
    arch = (hf_cfg.architectures or ["SpeechT5Model"])[0]
    import transformers

    model = getattr(transformers, arch).from_pretrained(path)
    cfg, variables, unknown = load_hf_checkpoint(model)
    return cfg, variables, unknown


def _load_component(path: str, component: str, llama_heads):
    """Convert one WavLLM pretrained component; returns ({"params": tree},
    unknown keys).  The tree is prefixed for WavLLMModel partial_load."""
    from ..utils import convert_components as cc

    if os.path.isfile(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd_np = {k: v.numpy() for k, v in sd.items()}
        hf_cfg = None
    else:
        from transformers import AutoConfig
        import transformers

        hf_cfg = AutoConfig.from_pretrained(path)
        arch = (hf_cfg.architectures or [None])[0] or {
            "wavlm": "WavLMModel", "whisper": "WhisperModel",
            "llama": "LlamaForCausalLM",
        }[component]
        model = getattr(transformers, arch).from_pretrained(path)
        sd_np = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    if component == "wavlm":
        params, unknown = cc.convert_wavlm_state_dict(sd_np)
        params = {"wavlm": params}
    elif component == "whisper":
        params, unknown = cc.convert_whisper_encoder_state_dict(sd_np)
        params = {"whisper": params}
    else:
        heads = llama_heads or (hf_cfg and hf_cfg.num_attention_heads)
        if not heads:
            raise SystemExit(
                "--llama-heads is required when converting a bare LLaMA "
                "state-dict file (RoPE un-permutation needs the head count)"
            )
        params, unknown = cc.convert_llama_state_dict(sd_np, num_heads=heads)
    return {"params": params}, unknown


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", required=True,
                   help="fairseq .pt checkpoint, or HF model dir/state-dict")
    p.add_argument("--format", choices=("fairseq", "hf"), default="fairseq")
    p.add_argument("--component", choices=("wavlm", "whisper", "llama"),
                   default=None,
                   help="convert one WavLLM pretrained component instead of "
                        "a full SpeechT5 checkpoint")
    p.add_argument("--llama-heads", type=int, default=None,
                   help="attention head count for --component llama from a "
                        "bare state-dict file")
    p.add_argument("--arch", default="speecht5_base_asr")
    p.add_argument("--dict", dest="dict_path", default=None)
    p.add_argument("--vocab-size", type=int, default=None)
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--strict", action="store_true",
                   help="fail on any unknown/missing key")
    args = p.parse_args(argv)

    import jax
    from .. import config as C
    from ..models.speecht5 import init_model
    from ..utils.convert import load_fairseq_checkpoint, verify_against
    from ..utils.checkpoint import CheckpointManager, partial_load

    from ..data.dictionary import load_cli_dictionary

    if args.component is not None:
        variables, unknown = _load_component(
            args.pt, args.component, args.llama_heads
        )
        if args.strict and unknown:
            raise SystemExit(json.dumps({"unknown_keys": unknown}, indent=2))
        mgr = CheckpointManager(args.out)
        mgr.save_model_only(0, variables)
        mgr.wait()
        print(json.dumps({
            "out": args.out, "component": args.component,
            "n_unknown": len(unknown),
        }))
        return {"unknown_keys": unknown}

    _, cfg_kw = load_cli_dictionary(args.dict_path, args.vocab_size)

    if args.format == "hf":
        hf_cfg, converted, unknown = _load_hf(args.pt)
        cfg = hf_cfg if hf_cfg is not None else getattr(C, args.arch)(**cfg_kw)
    else:
        cfg = getattr(C, args.arch)(**cfg_kw)
        converted, _, unknown = load_fairseq_checkpoint(args.pt)

    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    missing, extra, mism = verify_against(converted, variables)
    report = {
        "unknown_keys": unknown,
        "missing_params": missing,
        "extra_params": extra,
        "shape_mismatches": mism,
    }
    if args.strict and (unknown or missing or mism):
        raise SystemExit(json.dumps(report, indent=2))

    merged = dict(variables)
    merged["params"] = partial_load(
        variables["params"], converted.get("params", {})
    )
    if "batch_stats" in converted and "batch_stats" in variables:
        merged["batch_stats"] = partial_load(
            variables["batch_stats"], converted["batch_stats"]
        )

    mgr = CheckpointManager(args.out)
    mgr.save_model_only(0, merged)
    mgr.wait()
    print(json.dumps({
        "out": args.out,
        "n_unknown": len(unknown),
        "n_missing": len(missing),
        "n_mismatched": len(mism),
    }))
    return report


if __name__ == "__main__":
    main()
