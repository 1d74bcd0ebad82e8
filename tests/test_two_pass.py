"""Two-stage backprop (TrainConfig.microbatch): exact listwise gradients at
O(microbatch) activation memory. The step must produce the same loss and the
same parameter update as whole-batch autodiff — the split at the descriptor
boundary is algebraically exact, not an approximation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.models import create_model
from dirjax.train import (TrainConfig, fit, make_optimizer, make_train_step,
                          make_two_pass_train_step)


def _setup(microbatch, batch=8, seed=0, optimizer="adam"):
    # the equality test uses plain SGD: its update is LINEAR in the grad, so
    # param diffs bound grad diffs directly (Adam's 1/(sqrt(v)+eps) would
    # turn fp32 summation-order noise on near-zero grads into O(lr) blips)
    cfg = TrainConfig(arch="resnet18_rmac", out_dim=32, nq=10,
                      batch_size=batch, microbatch=microbatch,
                      optimizer=optimizer, momentum=0.0, weight_decay=0.0,
                      learning_rate=1e-3, lr_schedule="constant")
    model = create_model(cfg.arch, out_dim=cfg.out_dim)
    params = model.init(jax.random.PRNGKey(seed))
    tx = make_optimizer(cfg, params)
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(batch, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % (batch // 2))
    return cfg, model, params, tx, images, labels


@pytest.mark.parametrize("microbatch", [2, 4, 8])
def test_matches_whole_batch_autodiff(microbatch):
    cfg, model, params, tx, images, labels = _setup(microbatch,
                                                    optimizer="sgd")
    dense = make_train_step(model, cfg, tx)
    two = make_two_pass_train_step(model, cfg, tx)
    opt0 = tx.init(params)

    p1, _, l1 = dense(params, opt0, images, labels)
    p2, _, l2 = two(params, opt0, images, labels)
    assert np.isclose(float(l1), float(l2), atol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        # SGD: param diff = lr * grad diff, so this bounds the gradient
        # mismatch at ~1e-2 of a unit grad — far below any semantic error
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_bad_microbatch_rejected():
    cfg, model, params, tx, *_ = _setup(3)  # 3 does not divide 8
    with pytest.raises(AssertionError):
        make_two_pass_train_step(model, cfg, tx)


def test_loss_decreases_with_microbatching():
    cfg, model, params, tx, images, labels = _setup(2, batch=4)
    step = make_two_pass_train_step(model, cfg, tx)
    opt_state = tx.init(params)
    first = None
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, images, labels)
        first = first if first is not None else float(loss)
    assert float(loss) < first, (first, float(loss))


def test_fit_truncates_leftover_batches(tmp_path):
    """fit(microbatch=2) on a dataset whose group batches come out ragged
    must still run (leftovers truncated to a microbatch multiple)."""
    from dirjax.datasets.synthetic import SyntheticLabels

    ds = SyntheticLabels()
    cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, nq=5, epochs=1,
                      batch_size=4, microbatch=2, threads=2,
                      trfs="Scale(32), CenterCrop(32)")
    model, params, history = fit(ds, cfg, steps_per_epoch=3)
    assert len(history) == 1 and np.isfinite(history[0]["loss"])


def test_sharded_two_pass_matches_dense():
    """cfg.microbatch composed with the DP+TP mesh shardings: same update as
    the sharded whole-batch step on the 8-virtual-device mesh."""
    from dirjax.parallel import make_mesh
    from dirjax.train import make_sharded_train_step

    mesh = make_mesh(data=4, db=2)
    cfg_d, model, params, tx, images, labels = _setup(0, optimizer="sgd")
    cfg_m = TrainConfig(**{**cfg_d.__dict__, "microbatch": 4})

    outs = []
    for cfg in (cfg_d, cfg_m):
        step, shard_args = make_sharded_train_step(model, cfg, tx, mesh)
        sp, so, si, sl = shard_args(params, tx.init(params), images, labels)
        p, _, loss = step(sp, so, si, sl)
        outs.append((p, float(loss)))
    (p1, l1), (p2, l2) = outs
    assert np.isclose(l1, l2, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
