"""Training flash-attention kernel (banded rel-pos bias + dropout, custom VJP).

Runs in Pallas interpret mode on the CPU mesh; the same code path compiles on
TPU (bench_kernels.py / bench_train.py measure it there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speecht5_tpu.ops.pallas_kernels import banded_attention_train

N, T, D = 4, 40, 8
M = 5  # max rel distance -> band built from a [2M, D] table


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((N, T, D)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((2 * M, D)), jnp.float32) * 0.2
    from speecht5_tpu.models.attention import band_from_table

    band = band_from_table(table, T, M)  # [D, T, T]
    lengths = jnp.asarray([T, T - 7, T - 1, 9], jnp.int32)
    return q, k, v, band, lengths


def xla_reference(q, k, v, band, lengths):
    s = jnp.einsum("nqd,nkd->nqk", q, k).astype(jnp.float32)
    s = s + jnp.einsum(
        "nqd,dqk->nqk", q.astype(jnp.float32), band.astype(jnp.float32)
    )
    ok = jnp.arange(T)[None, :] < lengths[:, None]
    s = jnp.where(ok[:, None, :], s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32)).astype(q.dtype)


def test_forward_matches_xla_no_dropout():
    q, k, v, band, lengths = make_inputs()
    out = banded_attention_train(q, k, v, band, lengths, dropout_rate=0.0)
    ref = xla_reference(q, k, v, band, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla_no_dropout():
    q, k, v, band, lengths = make_inputs(1)
    cot = jnp.asarray(
        np.random.default_rng(9).standard_normal((N, T, D)), jnp.float32
    )

    def loss_kernel(q, k, v, band):
        out = banded_attention_train(q, k, v, band, lengths, dropout_rate=0.0)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v, band):
        return jnp.sum(xla_reference(q, k, v, band, lengths) * cot)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, band)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, band)
    for gk, gr, name in zip(g_kernel, g_ref, ("dq", "dk", "dv", "dband")):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), atol=5e-5, rtol=1e-3,
            err_msg=name,
        )


def test_band_gradient_reaches_table():
    """Through band_from_table the kernel's dband must reach the pe table
    (the learned rel-pos embedding)."""
    q, k, v, _, lengths = make_inputs(2)
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((2 * M, D)), jnp.float32) * 0.2
    from speecht5_tpu.models.attention import band_from_table

    def loss(table):
        band = band_from_table(table, T, M)
        out = banded_attention_train(q, k, v, band, lengths, dropout_rate=0.0)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_dropout_deterministic_and_rate():
    q, k, v, band, lengths = make_inputs(4)
    a = banded_attention_train(q, k, v, band, lengths,
                               dropout_rate=0.4, seed=7)
    b = banded_attention_train(q, k, v, band, lengths,
                               dropout_rate=0.4, seed=7)
    c = banded_attention_train(q, k, v, band, lengths,
                               dropout_rate=0.4, seed=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # expectation is preserved: mean over many seeds approaches the
    # no-dropout output (scaled-keep dropout is unbiased)
    outs = [
        np.asarray(
            banded_attention_train(q, k, v, band, lengths,
                                   dropout_rate=0.4, seed=s)
        )
        for s in range(30)
    ]
    ref = np.asarray(
        banded_attention_train(q, k, v, band, lengths, dropout_rate=0.0)
    )
    err = np.abs(np.mean(outs, axis=0) - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert err < 0.25, err


def _np_keep_mask(seed, rate, n_heads, Tq, Tk):
    """numpy replica of the kernel's lowbias32 counter hash."""
    q_idx = np.arange(Tq, dtype=np.uint32)[None, :, None]
    k_idx = np.arange(Tk, dtype=np.uint32)[None, None, :]
    n_idx = np.arange(n_heads, dtype=np.uint32)[:, None, None]
    with np.errstate(over="ignore"):
        x = (q_idx * np.uint32(0x9E3779B1)) ^ (k_idx * np.uint32(0x85EBCA77))
        x = x + (np.uint32(seed) + n_idx * np.uint32(0x27D4EB2F))
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x7FEB352D)
        x = x ^ (x >> np.uint32(15))
        x = x * np.uint32(0x846CA68B)
        x = x ^ (x >> np.uint32(16))
    thresh = min(int((1.0 - rate) * 4294967296.0), 4294967295)
    return (x < np.uint32(thresh)).astype(np.float32)


def test_dropout_output_and_gradients_match_masked_reference():
    """Replicate the kernel's counter-hash mask in numpy and require the
    kernel's output AND custom VJP to match an explicit-mask XLA reference
    exactly (the mask is a deterministic function of (seed, n, q, k), which
    is also what lets the backward kernels regenerate it)."""
    q, k, v, band, lengths = make_inputs(5)
    rate, seed = 0.3, 11
    keep = jnp.asarray(_np_keep_mask(seed, rate, N, T, T))

    def ref(q, k, v, band):
        s = jnp.einsum("nqd,nkd->nqk", q, k).astype(jnp.float32)
        s = s + jnp.einsum(
            "nqd,dqk->nqk", q.astype(jnp.float32), band.astype(jnp.float32)
        )
        ok = jnp.arange(T)[None, :] < lengths[:, None]
        s = jnp.where(ok[:, None, :], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        p = p * keep / (1.0 - rate)
        return jnp.einsum("nqk,nkd->nqd", p, v.astype(jnp.float32))

    out = banded_attention_train(q, k, v, band, lengths,
                                 dropout_rate=rate, seed=seed)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref(q, k, v, band)), atol=3e-5, rtol=1e-4
    )

    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal((N, T, D)), jnp.float32
    )
    gk = jax.grad(
        lambda *a: jnp.sum(
            banded_attention_train(*a, lengths, dropout_rate=rate, seed=seed)
            * cot
        ),
        argnums=(0, 1, 2, 3),
    )(q, k, v, band)
    gr = jax.grad(
        lambda *a: jnp.sum(ref(*a) * cot), argnums=(0, 1, 2, 3)
    )(q, k, v, band)
    for a, b, name in zip(gk, gr, ("dq", "dk", "dv", "dband")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=2e-3, err_msg=name
        )


def test_encoder_training_forward_matches_xla_path():
    """Full encoder stack: the fused train kernel (attention_dropout=0 so the
    two paths are numerically comparable) must match the XLA attention path
    in both the forward values and parameter gradients."""
    import dataclasses
    from speecht5_tpu.config import TransformerConfig
    from speecht5_tpu.models.encoder import TransformerEncoder

    base = TransformerConfig(
        d_model=32, ffn_dim=48, num_layers=2, num_heads=2,
        dropout=0.0, attention_dropout=0.0, layer_norm_first=False,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 32)), jnp.float32)
    valid = jnp.asarray(
        np.arange(24)[None, :] < np.array([[24], [17]]), bool
    )

    enc_xla = TransformerEncoder(base)
    variables = enc_xla.init(
        {"params": jax.random.PRNGKey(0)}, x, valid, deterministic=True
    )
    enc_pl = TransformerEncoder(
        dataclasses.replace(base, use_pallas_attn_train=True)
    )

    def run(enc, variables):
        def loss(params):
            out = enc.apply(
                {"params": params}, x, valid,
                deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out["encoder_out"] ** 2), out["encoder_out"]

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"]
        )
        return l, out, g

    l_ref, out_ref, g_ref = run(enc_xla, variables)
    l_pl, out_pl, g_pl = run(enc_pl, variables)
    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=3e-5, rtol=1e-4
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pl = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(g_pl)
    )
    for kp, ref in flat_ref:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(
            np.asarray(flat_pl[name]), np.asarray(ref),
            atol=1e-4, rtol=5e-3, err_msg=name,
        )


def test_encoder_training_with_dropout_runs():
    import dataclasses
    from speecht5_tpu.config import TransformerConfig
    from speecht5_tpu.models.encoder import TransformerEncoder

    cfg = TransformerConfig(
        d_model=32, ffn_dim=48, num_layers=2, num_heads=2,
        dropout=0.1, attention_dropout=0.1, layer_norm_first=False,
        use_pallas_attn_train=True,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 24, 32)), jnp.float32)
    enc = TransformerEncoder(cfg)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, None,
                         deterministic=True)

    def loss(params, key):
        out = enc.apply(
            {"params": params}, x, None, deterministic=False,
            rngs={"dropout": key},
        )
        return jnp.sum(out["encoder_out"] ** 2)

    l1, g = jax.value_and_grad(loss)(variables["params"], jax.random.PRNGKey(5))
    l2 = loss(variables["params"], jax.random.PRNGKey(5))
    l3 = loss(variables["params"], jax.random.PRNGKey(6))
    assert np.isfinite(float(l1)) and float(l1) == float(l2) != float(l3)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
