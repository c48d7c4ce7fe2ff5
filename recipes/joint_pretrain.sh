#!/bin/sh
# Joint speech+text pretraining (reference README.md:80-119): HuBERT masked
# prediction + decoder reconstruction on speech, BART denoising on text,
# modality-pure interleaved batches, one shared optimizer.
DATA=${DATA:-data/pretrain}
python -m speecht5_tpu.cli.train \
  --task pretrain --arch speecht5_base \
  --manifest $DATA/speech_train.tsv --labels $DATA/speech_train.km \
  --text-file $DATA/text_train.txt --dict $DATA/dict.txt \
  --tokens-per-sample 512 --text-ratio 1.0 \
  --lr 2e-4 --warmup 25000 --max-updates 800000 --accum 2 \
  --batch-size 16 --normalize --dtype bfloat16 \
  --save-dir ckpt/pretrained
