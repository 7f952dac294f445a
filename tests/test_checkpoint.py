"""Checkpoint save/restore roundtrip (orbax) + recover semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmmot_tpu.configs import tiny
from mmmot_tpu.models import model_entry
from mmmot_tpu.train import create_train_state, train_step
from mmmot_tpu.train.checkpoint import (latest_step, restore_checkpoint,
                                        save_checkpoint)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny()
    net = model_entry(cfg.model)
    rng = np.random.default_rng(0)
    N, P, HW = cfg.data.max_dets, cfg.data.point_len, cfg.data.crop_size[0]
    from mmmot_tpu.data.synthetic import make_training_batch

    b = make_training_batch(rng, batch_size=2, num_slots=N,
                            crop_size=(HW, HW), points_per_det=P)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    state = create_train_state(net, cfg.train, jax.random.PRNGKey(0), batch,
                               steps_per_epoch=5)
    return net, state, batch


def test_roundtrip(tmp_path, setup):
    net, state, batch = setup
    step = jax.jit(lambda s, b, r: train_step(net, s, b, r))
    state2, _ = step(state, batch, jax.random.PRNGKey(1))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state2, int(state2.step))
    assert latest_step(d) == 1
    restored = restore_checkpoint(d, state)
    assert int(restored.step) == int(state2.step)
    for a, b_ in zip(jax.tree.leaves(restored.params),
                     jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    for a, b_ in zip(jax.tree.leaves(restored.opt_state),
                     jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_keep_limit(tmp_path, setup):
    net, state, batch = setup
    d = str(tmp_path / "ckpt2")
    for s in range(4):
        save_checkpoint(d, state.replace(step=jnp.int32(s)), s, keep=2)
    assert latest_step(d) == 3


def test_missing_dir_raises(tmp_path, setup):
    net, state, _ = setup
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), state)
