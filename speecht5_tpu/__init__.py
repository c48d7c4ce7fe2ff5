"""TPU-native speech-text framework with the capabilities of microsoft/SpeechT5.

Pure JAX/XLA/Pallas compute path; see SURVEY.md for the structural map of the
reference this framework re-implements TPU-first.
"""

from . import config

__version__ = "0.1.0"
