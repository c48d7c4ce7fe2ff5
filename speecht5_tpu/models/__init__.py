"""Model families on the shared TPU-native substrate."""

from .speecht5 import SpeechT5Model, init_model
from .hifigan import HiFiGANGenerator, HiFiGANConfig
from .lm import TransformerLM
from .speechlm import SpeechLMModel, speechlm_tiny
from .speechut import SpeechUTModel, speechut_tiny
from .speech2c import Speech2CModel
from .yitrans import YiTransModel, yitrans_tiny
from .vatlm import VATLMModel, vatlm_tiny
from .wavllm import WavLLMModel, wavllm_tiny
from .wavlm import WavLMEncoderModel, wavlm_base, wavlm_large
from .vallex import VALLEX, vallex_tiny, init_vallex
from .fastspeech2 import FastText2Unit, fastspeech2_tiny, init_fastspeech2

__all__ = [
    "SpeechT5Model", "init_model", "HiFiGANGenerator", "HiFiGANConfig",
    "TransformerLM", "SpeechLMModel", "speechlm_tiny", "SpeechUTModel",
    "speechut_tiny", "Speech2CModel", "YiTransModel", "yitrans_tiny",
    "VATLMModel", "vatlm_tiny", "WavLLMModel", "wavllm_tiny",
    "WavLMEncoderModel", "wavlm_base", "wavlm_large", "VALLEX",
    "vallex_tiny", "init_vallex", "FastText2Unit", "fastspeech2_tiny",
    "init_fastspeech2",
]
from .viola import VioLAModel, VioLAConfig, viola_tiny  # noqa: F401
