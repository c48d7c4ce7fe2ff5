"""Inference runtimes: jitted beam search (ASR/ST), AR mel decode (TTS/VC),
batched classification (SID), lexicon+n-gram-LM CTC decode (native)."""

from .asr import ASRDecoder, greedy_ctc
from .tts import TTSDecoder, TTSResult
from .sid import SIDClassifier
from .beam_search import beam_search, BeamResult, ngram_repeat_mask

__all__ = [
    "ASRDecoder", "greedy_ctc", "TTSDecoder", "TTSResult", "SIDClassifier",
    "beam_search", "BeamResult", "ngram_repeat_mask",
]
