"""CTC loss parity vs torch.nn.functional.ctc_loss (CPU oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from speecht5_tpu.ops.ctc import ctc_loss


@pytest.fixture
def case(rng):
    B, T, V, L = 3, 20, 7, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    labels = rng.integers(1, V, (B, L))
    logit_lengths = np.asarray([20, 15, 9])
    label_lengths = np.asarray([6, 4, 2])
    return lp, logit_lengths, labels, label_lengths


class TestCTCLoss:
    def test_matches_torch(self, case):
        import torch
        import torch.nn.functional as F

        lp, logit_lengths, labels, label_lengths = case
        got = np.asarray(ctc_loss(
            jnp.asarray(lp), jnp.asarray(logit_lengths),
            jnp.asarray(labels), jnp.asarray(label_lengths), blank_id=0,
        ))
        ref = F.ctc_loss(
            torch.tensor(lp).transpose(0, 1),  # [T, B, V]
            torch.tensor(labels),
            torch.tensor(logit_lengths),
            torch.tensor(label_lengths),
            blank=0, reduction="none",
        ).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_repeated_labels(self, rng):
        import torch
        import torch.nn.functional as F

        B, T, V = 2, 15, 5
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        labels = np.asarray([[2, 2, 3, 3], [1, 1, 1, 1]])
        got = np.asarray(ctc_loss(
            jnp.asarray(lp), jnp.asarray([15, 15]),
            jnp.asarray(labels), jnp.asarray([4, 4]), blank_id=0,
        ))
        ref = F.ctc_loss(
            torch.tensor(lp).transpose(0, 1), torch.tensor(labels),
            torch.tensor([15, 15]), torch.tensor([4, 4]),
            blank=0, reduction="none",
        ).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    def test_gradient_finite(self, case):
        import jax

        lp, logit_lengths, labels, label_lengths = case

        def loss(lp):
            return ctc_loss(
                lp, jnp.asarray(logit_lengths), jnp.asarray(labels),
                jnp.asarray(label_lengths), 0,
            ).sum()

        g = jax.grad(loss)(jnp.asarray(lp))
        assert np.isfinite(np.asarray(g)).all()


class TestZeroInfinity:
    def test_infeasible_matches_torch_zero_infinity(self, rng):
        """Samples whose labels can't fit in the frames: torch with
        zero_infinity=True zeroes them; feasible rows are untouched
        (reference passes --zero-infinity in the ASR recipe,
        SpeechT5/README.md:178)."""
        import torch
        import torch.nn.functional as F

        B, T, V, L = 3, 6, 7, 6
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        labels = rng.integers(1, V, (B, L))
        logit_lengths = np.asarray([6, 3, 6])
        label_lengths = np.asarray([6, 6, 2])  # row 1 infeasible (6 > 3)
        got = np.asarray(ctc_loss(
            jnp.asarray(lp), jnp.asarray(logit_lengths),
            jnp.asarray(labels), jnp.asarray(label_lengths), blank_id=0,
            zero_infinity=True,
        ))
        ref = F.ctc_loss(
            torch.tensor(lp).transpose(0, 1), torch.tensor(labels),
            torch.tensor(logit_lengths), torch.tensor(label_lengths),
            blank=0, reduction="none", zero_infinity=True,
        ).numpy()
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
        assert got[1] == 0.0

    def test_infeasible_grads_are_zero(self, rng):
        """The zeroed sample must contribute zero (not NaN/garbage) gradient."""
        import jax

        B, T, V, L = 2, 4, 5, 4
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        labels = rng.integers(1, V, (B, L))

        def f(x):
            lp = jax.nn.log_softmax(x, axis=-1)
            return ctc_loss(
                lp, jnp.asarray([4, 2]), jnp.asarray(labels),
                jnp.asarray([2, 4]), blank_id=0, zero_infinity=True,
            ).sum()

        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g[1], 0.0, atol=1e-7)
        assert np.abs(g[0]).max() > 0
