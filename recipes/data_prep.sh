#!/bin/sh
# Dataset preparation chain (reference SpeechLM/speechlm/data_process/ +
# phoneme_tokenizer/): raw audio dir + word transcripts -> manifests,
# letter targets, kaldi phones, frame-level phones, T2U training TSV.
DATA=${DATA:-data/corpus}

# 1. audio manifest (root + relpath + nframes), 1% valid split
python -m speecht5_tpu.cli.prep manifest \
  --audio-root $DATA/wavs --out $DATA/train.tsv --valid-percent 0.01

# 2. word -> letter transcripts (reference wrd2ltr.py)
python -m speecht5_tpu.cli.prep wrd2ltr \
  --input $DATA/train.wrd --output $DATA/train.ltr

# 3. letters -> kaldi phones with !SIL p=0.25 (ltr2kaldi_phn_sil025.py)
python -m speecht5_tpu.cli.prep kaldi-phn \
  --input $DATA/train.ltr --lexicon $DATA/align_lexicon.txt \
  --output $DATA/train

# 4. reduced phones -> frame level from duration stats (repeat_withou...py)
python -m speecht5_tpu.cli.prep repeat-phones \
  --input $DATA/train.kaldi_phn_sil025 \
  --mean-std $DATA/phone_mean_std.json --output $DATA/train.frame_phn

# 5. aligned phones + km units -> FastSpeech2 T2U manifest
python -m speecht5_tpu.cli.prep t2u-manifest \
  --audio-manifest $DATA/train.tsv --phn $DATA/train.frame_phn \
  --km $DATA/train.km --out $DATA/train.t2u.tsv

# 6. CoVoST2 columned ST tsv -> our manifest + labels (fixture-compatible)
python -m speecht5_tpu.cli.prep st-manifest \
  --tsv $DATA/dev_st_en_de.tsv --audio-root $DATA/wavs \
  --out-manifest $DATA/dev_st.tsv --out-labels $DATA/dev_st.de
