"""Masked primitive correctness vs plain numpy on the valid subset."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.ops import (masked_log_softmax, masked_max, masked_mean,
                           masked_softmax, pad_to, pair_mask)


@pytest.fixture
def data(rng):
    x = rng.normal(0, 3, (4, 6)).astype(np.float32)
    mask = rng.random((4, 6)) > 0.3
    mask[2] = False  # one fully-masked row
    return jnp.asarray(x), jnp.asarray(mask), x, mask


def test_masked_max(data):
    jx, jm, x, m = data
    out = np.asarray(masked_max(jx, jm, axis=1, fill=-7.0))
    for i in range(4):
        if m[i].any():
            assert out[i] == pytest.approx(x[i][m[i]].max())
        else:
            assert out[i] == -7.0


def test_masked_mean(data):
    jx, jm, x, m = data
    out = np.asarray(masked_mean(jx, jm, axis=1))
    for i in range(4):
        if m[i].any():
            assert out[i] == pytest.approx(x[i][m[i]].mean(), rel=1e-5)
        else:
            assert out[i] == 0.0


def test_masked_softmax(data):
    jx, jm, x, m = data
    out = np.asarray(masked_softmax(jx, jm, axis=1))
    assert not np.isnan(out).any()
    for i in range(4):
        if m[i].any():
            e = np.exp(x[i][m[i]] - x[i][m[i]].max())
            np.testing.assert_allclose(out[i][m[i]], e / e.sum(), rtol=1e-5)
        assert (out[i][~m[i]] == 0).all()
    # fully-masked row sums to 0, not NaN/uniform
    assert out[2].sum() == 0.0


def test_masked_log_softmax_consistency(data):
    jx, jm, x, m = data
    p = np.asarray(masked_softmax(jx, jm, axis=1))
    lp = np.asarray(masked_log_softmax(jx, jm, axis=1))
    np.testing.assert_allclose(np.exp(lp[0][m[0]]), p[0][m[0]], rtol=1e-5)


def test_pad_to():
    x = jnp.ones((3, 2))
    y = pad_to(x, 5, axis=0, fill=9.0)
    assert y.shape == (5, 2)
    assert float(y[3, 0]) == 9.0
    with pytest.raises(ValueError):
        pad_to(x, 2, axis=0)


def test_pair_mask():
    a = jnp.array([True, False, True])
    b = jnp.array([True, True])
    pm = pair_mask(a, b)
    assert pm.shape == (3, 2)
    assert bool(pm[0, 0]) and not bool(pm[1, 0])
