"""End-to-end slice: a few optimisation steps must reduce the tracking loss
and improve association quality on held-out synthetic data.

(The full quality loop — 12 epochs to MOTA ~93% on synthetic val — runs via
``cli.train``; this test keeps a fast regression version of it.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from mmmot_tpu.configs import tiny
from mmmot_tpu.data.synthetic import make_training_batch
from mmmot_tpu.models import model_entry
from mmmot_tpu.train import create_train_state, train_step


def test_loss_decreases_and_tracking_improves():
    cfg = tiny()
    net = model_entry(cfg.model)
    rng = np.random.default_rng(0)
    N, P = cfg.data.max_dets, cfg.data.point_len
    crop = cfg.data.crop_size

    def batch():
        b = make_training_batch(rng, batch_size=4, num_slots=N,
                                crop_size=crop, points_per_det=P,
                                drop_prob=0.05, fp_prob=0.1)
        return {k: jnp.asarray(v) for k, v in b.items()}

    import dataclasses

    key = jax.random.PRNGKey(0)
    tcfg = dataclasses.replace(cfg.train, lr=1e-3)
    state = create_train_state(net, tcfg, key, batch(), steps_per_epoch=20)
    step = jax.jit(lambda s, b, r: train_step(net, s, b, r))
    losses = []
    for i in range(20):
        state, m = step(state, batch(), jax.random.fold_in(key, i))
        losses.append(float(m["total"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.85, losses


def test_remat_training_step_identical():
    """model.remat=True (gradient-checkpointed VGG trunk) must be
    semantics-preserving: same loss, grad norm, and post-step params as
    the non-remat forward (it only changes what is stored vs recomputed
    in the backward pass)."""
    import dataclasses

    import __graft_entry__ as g
    from mmmot_tpu.configs import tiny
    from mmmot_tpu.models import model_entry
    from mmmot_tpu.train import create_train_state, train_step

    cfg = tiny()
    batch = g._example_batch(cfg, batch_size=2, with_labels=True)
    results = {}
    for remat in (False, True):
        net = model_entry(dataclasses.replace(cfg.model, remat=remat))
        state = create_train_state(net, cfg.train, jax.random.PRNGKey(0),
                                   batch, steps_per_epoch=10)
        step = jax.jit(lambda s, b, r, _n=net: train_step(
            _n, s, b, r, compact_capacity=8))
        s, m = step(state, batch, jax.random.PRNGKey(1))
        results[remat] = (float(m["total"]), float(m["grad_norm"]),
                          [np.asarray(x) for x in
                           jax.tree.leaves(s.params)[:4]])
    assert results[False][0] == results[True][0]
    assert results[False][1] == results[True][1]
    for a, b in zip(results[False][2], results[True][2]):
        np.testing.assert_array_equal(a, b)
