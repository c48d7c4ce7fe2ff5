"""SID inference: jitted batched speaker classification.

Replaces the reference's batch-1 generate_class loop
(reference scripts/generate_class.py:15-153, models/speecht5.py:1171-1186):
the whole batch classifies in one device program.
"""

from __future__ import annotations

import jax


class SIDClassifier:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        # variables passed as a jit argument (not a closure constant)
        self._fn = jax.jit(
            lambda v, wav, lengths: model.apply(
                v, wav, lengths, method="generate_class"
            )
        )

    def __call__(self, wav, wav_lengths):
        """wav: [B, T] raw waveform -> predicted class ids [B]."""
        return self._fn(self.variables, wav, wav_lengths)
