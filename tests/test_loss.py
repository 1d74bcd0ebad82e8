"""Loss tests: cross-checked against the reference torch implementation
loaded by file path, plus gradient sanity."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax import loss as L

REF_PATH = "/root/reference/dirtorch/loss.py"


def _load_ref():
    try:
        spec = importlib.util.spec_from_file_location("ref_loss", REF_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


REF = _load_ref()


@pytest.fixture
def batch(rng):
    N, M = 4, 40
    x = rng.random((N, M)).astype(np.float32)
    labels = (rng.random((N, M)) < 0.3).astype(np.float32)
    labels[:, 0] = 1  # ensure at least one positive per row
    return x, labels


@pytest.mark.skipif(REF is None, reason="reference loss.py not importable")
class TestAgainstReference:
    def test_aploss(self, batch):
        import torch

        x, labels = batch
        ours = float(L.APLoss(nq=20)(jnp.asarray(x), jnp.asarray(labels)))
        theirs = float(REF.APLoss(nq=20)(torch.from_numpy(x),
                                         torch.from_numpy(labels)))
        assert ours == pytest.approx(theirs, abs=1e-5)

    def test_aploss_ap_values(self, batch):
        import torch

        x, labels = batch
        ours = np.asarray(L.APLoss(nq=25)(jnp.asarray(x), jnp.asarray(labels),
                                          ret="AP"))
        theirs = REF.APLoss(nq=25)(torch.from_numpy(x), torch.from_numpy(labels),
                                   ret="AP").detach().numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    @pytest.mark.parametrize("simplified", [False, True])
    def test_taploss(self, batch, simplified):
        import torch

        x, labels = batch
        ours = float(L.TAPLoss(nq=20, simplified=simplified)(
            jnp.asarray(x), jnp.asarray(labels)))
        theirs = float(REF.TAPLoss(nq=20, simplified=simplified)(
            torch.from_numpy(x), torch.from_numpy(labels)))
        assert ours == pytest.approx(theirs, abs=1e-4)

    def test_aploss_dist(self, batch):
        import torch

        x, labels = batch
        x = x * 0.9  # keep sim_to_dist real
        ours = float(L.APLoss_dist(nq=20, min=-1, max=1)(
            jnp.asarray(x), jnp.asarray(labels)))
        theirs = float(REF.APLoss_dist(nq=20, min=-1, max=1)(
            torch.from_numpy(x), torch.from_numpy(labels)))
        assert ours == pytest.approx(theirs, abs=1e-5)

    def test_triplet_logexp(self, rng):
        import torch

        a = rng.normal(size=(8, 16)).astype(np.float32)
        p = rng.normal(size=(8, 16)).astype(np.float32)
        n = rng.normal(size=(8, 16)).astype(np.float32)
        ours = float(L.TripletLogExpLoss()(jnp.asarray(a), jnp.asarray(p),
                                           jnp.asarray(n)))
        theirs = float(REF.TripletLogExpLoss()(torch.from_numpy(a),
                                               torch.from_numpy(p),
                                               torch.from_numpy(n)))
        assert ours == pytest.approx(theirs, abs=1e-5)


class TestProperties:
    def test_perfect_ranking_gives_low_loss(self):
        # positives scored near 1, negatives near 0 -> AP ~ 1 -> loss ~ 0
        x = jnp.asarray([[0.95, 0.9, 0.1, 0.05]])
        labels = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        loss = float(L.APLoss()(x, labels))
        assert loss < 0.1

    def test_inverted_ranking_gives_high_loss(self):
        x = jnp.asarray([[0.05, 0.1, 0.9, 0.95]])
        labels = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        assert float(L.APLoss()(x, labels)) > 0.4

    def test_gradients_flow(self, batch):
        x, labels = batch
        grad = jax.grad(lambda s: L.APLoss()(s, jnp.asarray(labels)))(
            jnp.asarray(x))
        g = np.asarray(grad)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0

    def test_triplet_margin(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        loss_same = float(L.TripletMarginLoss(margin=1.0)(a, a, a))
        assert loss_same == pytest.approx(1.0)  # d_p == d_n -> margin

    def test_quantizer_partition(self, rng):
        """Interior scores get total soft-assignment ~1 across bins."""
        x = jnp.asarray(rng.random((2, 30)).astype(np.float32) * 0.8 + 0.1)
        q = L.quantize_scores(x, 25, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-5)
