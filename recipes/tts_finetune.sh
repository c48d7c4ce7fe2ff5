#!/bin/sh
# TTS fine-tune (t2s: Tacotron2 L1+L2+BCE + guided attention)
DATA=${DATA:-data/libritts}
python -m speecht5_tpu.cli.train \
  --task t2s --arch speecht5_base \
  --manifest $DATA/train.tsv --labels $DATA/train.txt --dict $DATA/dict.txt \
  --spkemb-dir $DATA/spkemb \
  --guided-attn --lr 1e-4 --warmup 10000 --max-updates 120000 \
  --batch-size 16 --dtype bfloat16 \
  --finetune-from ckpt/pretrained --save-dir ckpt/tts
