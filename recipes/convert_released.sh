#!/bin/sh
# Convert a released fairseq checkpoint (e.g. speecht5_base_asr.pt from the
# reference model zoo) into an orbax dir for --ckpt / --finetune-from.
python -m speecht5_tpu.cli.convert \
  --pt speecht5_base_asr.pt --arch speecht5_base_asr \
  --dict dict.ltr.txt --out ckpt/asr_converted --strict
