"""Pallas affinity kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.kernels import fold_bn_into_dense, pallas_link_scores

N, D, H = 16, 64, 32


def xla_reference(a, b, w1, b1, w2, b2, ops):
    pieces = []
    for op in ops:
        if op == "subabs":
            pieces.append(jnp.abs(a[:, None, :] - b[None, :, :]))
        elif op == "mul":
            pieces.append(a[:, None, :] * b[None, :, :])
        elif op == "diff":
            pieces.append(a[:, None, :] - b[None, :, :])
    pair = jnp.concatenate(pieces, -1) if len(pieces) > 1 else pieces[0]
    hidden = jnp.maximum(pair @ w1 + b1, 0.0)
    return (hidden @ w2 + b2)[..., 0]


@pytest.mark.parametrize("ops", [("subabs",), ("mul",), ("subabs", "mul")])
def test_kernel_matches_xla(rng, ops):
    r = np.random.default_rng(0)
    a = jnp.asarray(r.normal(0, 1, (N, D)).astype(np.float32))
    b = jnp.asarray(r.normal(0, 1, (N, D)).astype(np.float32))
    din = len(ops) * D
    w1 = jnp.asarray(r.normal(0, 0.1, (din, H)).astype(np.float32))
    b1 = jnp.asarray(r.normal(0, 0.1, H).astype(np.float32))
    w2 = jnp.asarray(r.normal(0, 0.1, (H, 1)).astype(np.float32))
    b2 = jnp.asarray(r.normal(0, 0.1, 1).astype(np.float32))
    ref = np.asarray(xla_reference(a, b, w1, b1, w2, b2, ops))
    out = np.asarray(pallas_link_scores(a, b, w1, b1, w2, b2, ops=ops,
                                        block_rows=8, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bn_folding():
    r = np.random.default_rng(1)
    k = jnp.asarray(r.normal(0, 0.3, (D, H)).astype(np.float32))
    bias = jnp.asarray(r.normal(0, 0.3, H).astype(np.float32))
    scale = jnp.asarray(r.uniform(0.5, 2.0, H).astype(np.float32))
    bn_b = jnp.asarray(r.normal(0, 0.3, H).astype(np.float32))
    mean = jnp.asarray(r.normal(0, 0.3, H).astype(np.float32))
    var = jnp.asarray(r.uniform(0.5, 2.0, H).astype(np.float32))
    x = jnp.asarray(r.normal(0, 1, (7, D)).astype(np.float32))
    eps = 1e-5
    ref = ((x @ k + bias) - mean) * jax.lax.rsqrt(var + eps) * scale + bn_b
    kf, bf = fold_bn_into_dense(k, bias, scale, bn_b, mean, var, eps)
    np.testing.assert_allclose(np.asarray(x @ kf + bf), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_bad_block_rows():
    a = jnp.zeros((10, D))
    with pytest.raises(ValueError, match="multiple"):
        pallas_link_scores(a, a, jnp.zeros((D, H)), jnp.zeros(H),
                           jnp.zeros((H, 1)), jnp.zeros(1), block_rows=8,
                           interpret=True)
