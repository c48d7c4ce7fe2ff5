#!/bin/sh
# SID fine-tune (reference README.md:606-652: no masking, decoder pooling,
# plain softmax head; manifest rows: wav \t n \t speaker_label)
DATA=${DATA:-data/voxceleb1}
python -m speecht5_tpu.cli.train \
  --task s2c --arch speecht5_base_sid \
  --manifest $DATA/train.tsv \
  --lr 2e-4 --warmup 2000 --max-updates 60000 --accum 2 \
  --batch-size 8 --max-sample-size 128000 --dtype bfloat16 \
  --finetune-from ckpt/pretrained --save-dir ckpt/sid
