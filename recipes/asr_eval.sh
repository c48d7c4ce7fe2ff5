#!/bin/sh
# ASR eval: joint CTC/attention beam search, whole batch on device
# (reference README.md:213-246 requires batch-size 1; here any batch)
DATA=${DATA:-data/librispeech}
python -m speecht5_tpu.cli.evaluate \
  --task s2t --arch speecht5_base_asr \
  --manifest $DATA/test_clean.tsv --labels $DATA/test_clean.ltr \
  --dict $DATA/dict.ltr.txt \
  --ckpt ckpt/asr_100h --beam 5 --ctc-weight 0.3 --batch-size 8 \
  --results-path results/test_clean
