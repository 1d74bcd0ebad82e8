"""Smoke tests for the recall-study harness (recall_study.py).

The study is the repo's serving-tier guidance instrument (RECALL_r05.json,
PERF_NOTES "Recall on realistic descriptor spectra"), so its stages must
keep working CPU-only: extraction over the synthetic scene generator, the
whiten->grade->tuner evaluate stage, the section-nesting of the artifact,
and the src_is_top1 gate that refuses to grade garbage descriptors.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
import recall_study  # noqa: E402


def test_extract_then_evaluate_tiny(tmp_path):
    descs = str(tmp_path / "descs.npz")
    out = str(tmp_path / "out.json")
    recall_study.main(["extract", "--cpu", "--arch", "resnet18_rmac",
                       "--n-db", "128", "--n-q", "16", "--batch", "16",
                       "--size", "96", "--out", descs])
    data = np.load(descs)
    assert data["db"].shape == (128, 2048)
    assert data["q"].shape == (16, 2048)
    assert np.isfinite(data["db"]).all()

    recall_study.main(["evaluate", "--descs", descs, "--out", out,
                       "--section", "tiny", "--tiers", "int8"])
    doc = json.load(open(out))
    sec = doc["tiny"]
    assert sec["n_db"] == 128 and sec["n_q"] == 16
    assert 0.0 < sec["src_is_top1"] <= 1.0
    assert "top16_variance_share" in sec["spectrum"]
    # int8 on 2048 dims is near-lossless on every spectrum measured
    assert sec["tiers"]["int8"]["recall@1"] >= 0.8

    # incremental re-grade merges into the existing section
    recall_study.main(["evaluate", "--descs", descs, "--out", out,
                       "--section", "tiny", "--tiers", "int8"])
    doc2 = json.load(open(out))
    assert set(doc2) == {"tiny"}
    assert doc2["tiny"]["tiers"]["int8"] == sec["tiers"]["int8"]


def test_gate_refuses_meaningless_descriptors(tmp_path):
    # queries unrelated to the db: the true-source sanity check must fail
    # closed instead of grading tiers against tie-order noise
    rng = np.random.default_rng(0)
    descs = str(tmp_path / "garbage.npz")
    np.savez(descs, db=rng.normal(size=(64, 32)).astype(np.float32),
             q=rng.normal(size=(8, 32)).astype(np.float32),
             src=np.arange(8))
    with pytest.raises(RuntimeError, match="src_is_top1"):
        recall_study.main(["evaluate", "--descs", descs,
                           "--out", str(tmp_path / "o.json"),
                           "--tiers", "int8"])


def test_extract_gate_refuses_nonfinite(tmp_path, monkeypatch):
    # a wedged chip once emitted all-NaN descriptors; extraction must
    # refuse to save them
    import jax.numpy as jnp

    from dirjax.models import rmac

    real = rmac.apply_descriptor

    def poisoned(params, imgs, cfg, **kw):
        out = real(params, imgs, cfg, **kw)
        return out * jnp.nan

    monkeypatch.setattr(rmac, "apply_descriptor", poisoned)
    with pytest.raises(RuntimeError, match="non-finite"):
        recall_study.main(["extract", "--cpu", "--arch", "resnet18_rmac",
                           "--n-db", "32", "--n-q", "16", "--batch", "16",
                           "--size", "64",
                           "--out", str(tmp_path / "d.npz")])
