#!/bin/sh
# ASR 100h fine-tune (reference SpeechT5/README.md:80-130: t5_transformer_base_asr,
# CE + 0.5*CTC... reference uses ce_weight 1.0 ctc_weight 0.5 via criterion flags,
# tri-stage-like warmup, update-freq 2)
DATA=${DATA:-data/librispeech_100h}
python -m speecht5_tpu.cli.train \
  --task s2t --arch speecht5_base_asr \
  --manifest $DATA/train.tsv --labels $DATA/train.ltr --dict $DATA/dict.ltr.txt \
  --valid-manifest $DATA/dev.tsv --valid-labels $DATA/dev.ltr \
  --ctc-weight 0.5 --label-smoothing 0.1 \
  --lr 6e-5 --warmup 8000 --max-updates 80000 --accum 2 \
  --batch-size 16 --normalize --dtype bfloat16 \
  --finetune-from ckpt/pretrained \
  --save-dir ckpt/asr_100h
