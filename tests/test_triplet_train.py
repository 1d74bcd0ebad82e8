"""Batch-hard triplet training (the reference's TL model family).

The reference ships TripletMarginLoss/TripletLogExpLoss (loss.py:139-207)
but no trainer; dirjax mines hard triplets in-batch so the TL recipe runs
through the same fit()/sharded/two-pass machinery as the AP losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.loss import TripletLogExpLoss, TripletMarginLoss
from dirjax.models import create_model
from dirjax.train import (TrainConfig, batch_hard_triplet_loss,
                          make_batch_objective, make_optimizer,
                          make_train_step, make_two_pass_train_step)

rng = np.random.default_rng(11)


def _descs_labels(n=8, d=16):
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return jnp.asarray(x), jnp.asarray(np.arange(n) % 3)


def test_batch_hard_matches_manual_mining():
    descs, labels = _descs_labels()
    loss_fn = TripletMarginLoss(margin=0.5)
    got = float(batch_hard_triplet_loss(descs, labels, loss_fn))

    x = np.asarray(descs)
    lab = np.asarray(labels)
    # manual: same |a - b + eps|^p distance as the loss class
    d = np.power(np.sum(np.abs(x[:, None] - x[None, :] + 1e-6) ** 2, -1), 0.5)
    per = []
    for i in range(len(x)):
        pos = [j for j in range(len(x)) if lab[j] == lab[i] and j != i]
        neg = [j for j in range(len(x)) if lab[j] != lab[i]]
        if pos and neg:
            per.append(max(0.0, d[i, max(pos, key=lambda j: d[i, j])]
                           - d[i, min(neg, key=lambda j: d[i, j])] + 0.5))
    assert np.isclose(got, np.mean(per), atol=1e-5), (got, np.mean(per))


def test_anchors_without_positive_are_excluded():
    descs, _ = _descs_labels(4)
    labels = jnp.asarray([0, 1, 2, 3])       # no positives at all
    loss = batch_hard_triplet_loss(descs, labels, TripletMarginLoss())
    assert float(loss) == 0.0
    labels = jnp.asarray([0, 0, 1, 2])       # only rows 0,1 have positives
    loss = float(batch_hard_triplet_loss(descs, labels, TripletMarginLoss()))
    assert np.isfinite(loss) and loss >= 0.0


@pytest.mark.parametrize("loss_name", ["triplet", "tripletlogexp"])
def test_triplet_training_reduces_loss(loss_name):
    cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, loss=loss_name,
                      margin=0.3, batch_size=8, learning_rate=1e-3,
                      optimizer="sgd", momentum=0.0, weight_decay=0.0)
    model = create_model(cfg.arch, out_dim=cfg.out_dim)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, params)
    step = make_train_step(model, cfg, tx)
    opt_state = tx.init(params)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 2)
    first = None
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, images, labels)
        first = first if first is not None else float(loss)
    assert float(loss) < first, (first, float(loss))


def test_triplet_two_pass_matches_dense():
    cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, loss="triplet",
                      batch_size=8, microbatch=4, learning_rate=1e-3,
                      optimizer="sgd", momentum=0.0, weight_decay=0.0)
    model = create_model(cfg.arch, out_dim=cfg.out_dim)
    params = model.init(jax.random.PRNGKey(1))
    tx = make_optimizer(cfg, params)
    dense = make_train_step(model, cfg, tx)
    two = make_two_pass_train_step(model, cfg, tx)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 3)
    opt0 = tx.init(params)
    p1, _, l1 = dense(params, opt0, images, labels)
    p2, _, l2 = two(params, opt0, images, labels)
    assert np.isclose(float(l1), float(l2), atol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_logexp_from_distances_matches_call():
    loss = TripletLogExpLoss()
    a, p, n = (jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32))
               for _ in range(3))
    want = float(loss(a, p, n))
    from dirjax.loss import _pairwise_distance

    dp = _pairwise_distance(a, p, loss.p, loss.eps)
    dn = _pairwise_distance(a, n, loss.p, loss.eps)
    got = float(jnp.mean(loss.from_distances(dp, dn)))
    assert np.isclose(want, got, atol=1e-6)


def test_triplet_sharded_microbatch_matches_dense():
    """All three axes at once: batch-hard triplets + two-pass microbatching
    + the DP+TP mesh — must equal the sharded whole-batch triplet step."""
    from dirjax.parallel import make_mesh
    from dirjax.train import make_sharded_train_step

    mesh = make_mesh(data=4, db=2)
    cfg_d = TrainConfig(arch="resnet18_rmac", out_dim=16, loss="triplet",
                        margin=0.3, batch_size=8, learning_rate=1e-3,
                        optimizer="sgd", momentum=0.0, weight_decay=0.0)
    cfg_m = TrainConfig(**{**cfg_d.__dict__, "microbatch": 4})
    model = create_model(cfg_d.arch, out_dim=cfg_d.out_dim)
    params = model.init(jax.random.PRNGKey(2))
    tx = make_optimizer(cfg_d, params)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 3)
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
