#!/bin/sh
# VC fine-tune (s2s; manifest rows: src_wav \t n \t tgt_wav \t n \t spkemb.npy)
DATA=${DATA:-data/cmu_arctic}
python -m speecht5_tpu.cli.train \
  --task s2s --arch speecht5_base \
  --manifest $DATA/bdl_to_slt.tsv \
  --guided-attn --lr 1e-4 --warmup 6000 --max-updates 60000 \
  --batch-size 8 --dtype bfloat16 \
  --finetune-from ckpt/pretrained --save-dir ckpt/vc
