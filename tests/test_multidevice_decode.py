"""Multi-device inference on the 8-device CPU mesh: data-parallel and
tensor-parallel jitted beam decode reproduce the single-device hypotheses.

The reference decodes multi-GPU only through fairseq-generate's world-size
sharding of the dataset (no in-tree code); here the SAME jitted decode
program partitions over a jax.sharding.Mesh (SURVEY.md 2.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speecht5_tpu.config import speecht5_tiny
from speecht5_tpu.models.speecht5 import init_model
from speecht5_tpu.decode.asr import ASRDecoder
from speecht5_tpu.parallel.sharding import (
    make_mesh, shard_decode_batch, shard_decode_variables,
)


@pytest.fixture(scope="module")
def setup():
    cfg = speecht5_tiny()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, T = 8, 4000
    wav = jnp.asarray(rng.standard_normal((B, T)), jnp.float32) * 0.1
    lengths = jnp.asarray([T, T - 500, T, T - 1000] * 2, jnp.int32)
    dec = ASRDecoder(model, variables, beam_size=3, max_len=8, ctc_weight=0.3)
    ref = dec(wav, lengths)
    return cfg, model, variables, wav, lengths, ref


class TestMultiDeviceDecode:
    def test_data_parallel_matches_single(self, setup):
        cfg, model, variables, wav, lengths, ref = setup
        mesh = make_mesh(n_data=8, n_model=1)
        v = shard_decode_variables(variables, mesh)
        dec = ASRDecoder(model, v, beam_size=3, max_len=8, ctc_weight=0.3)
        args = shard_decode_batch((wav, lengths), mesh)
        res = dec(*args)
        np.testing.assert_array_equal(
            np.asarray(res.tokens), np.asarray(ref.tokens))
        np.testing.assert_allclose(
            np.asarray(res.scores), np.asarray(ref.scores),
            rtol=1e-4, atol=1e-5)
        # outputs actually live sharded over the data axis
        assert len(res.tokens.sharding.device_set) == 8

    def test_tensor_parallel_matches_single(self, setup):
        cfg, model, variables, wav, lengths, ref = setup
        mesh = make_mesh(n_data=2, n_model=4)
        v = shard_decode_variables(variables, mesh, tensor_parallel=True)
        # Megatron rules really split the attention/FFN kernels
        k = v["params"]["encoder"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        assert len(k.sharding.device_set) > 1
        dec = ASRDecoder(model, v, beam_size=3, max_len=8, ctc_weight=0.3)
        args = shard_decode_batch((wav, lengths), mesh)
        res = dec(*args)
        np.testing.assert_array_equal(
            np.asarray(res.tokens), np.asarray(ref.tokens))
        np.testing.assert_allclose(
            np.asarray(res.scores), np.asarray(ref.scores),
            rtol=1e-3, atol=1e-4)

    def test_indivisible_batch_rejected(self, setup):
        cfg, model, variables, wav, lengths, _ = setup
        mesh = make_mesh(n_data=8, n_model=1)
        with pytest.raises(AssertionError, match="divisible"):
            shard_decode_batch((wav[:6], lengths[:6]), mesh)
