"""Convert a released fairseq .pt checkpoint into an orbax model dir usable
by the evaluate/train CLIs (--ckpt / --finetune-from).

Usage:
    python -m speecht5_tpu.cli.convert --pt speecht5_base_asr.pt \
        --arch speecht5_base_asr --dict dict.txt --out ckpt_converted/

The mapping covers the namespaces in reference models/speecht5.py:1022-1058
(SURVEY.md 3.5); unknown keys are listed, shape mismatches raise.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", required=True, help="fairseq .pt checkpoint")
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

    _, cfg_kw = load_cli_dictionary(args.dict_path, args.vocab_size)

    cfg = getattr(C, args.arch)(**cfg_kw)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    converted, ckpt_cfg, unknown = load_fairseq_checkpoint(args.pt)
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
