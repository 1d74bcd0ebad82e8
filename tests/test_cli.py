"""End-to-end CLI tests: run the real entry points in-process on the
synthetic benchmark with a converted reference-schema checkpoint."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.models import create_model
from dirjax.utils.checkpoints import Checkpoint, save_native


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_cli"))
    D.Synthetic(root, revisited=True)  # materialize
    return root


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    model = create_model("resnet18_rmac", out_dim=32)
    params = model.init(jax.random.PRNGKey(0))
    from dirjax.ops import fit_pca

    rng = np.random.default_rng(0)
    pca = fit_pca(rng.normal(size=(64, 32)))
    path = str(tmp_path_factory.mktemp("ckpt") / "model.npz")
    save_native(path, Checkpoint(model=model, params=params,
                                 preprocess=model.preprocess,
                                 pca={"Landmarks_clean": pca}))
    return path


class TestTestDirCLI:
    def test_eval_synthetic(self, synth_root, ckpt_path, tmp_path):
        from dirjax.cli.test_dir import main

        out_json = str(tmp_path / "out.json")
        res = main([
            "--dataset", f"Synthetic('{synth_root}')",
            "--checkpoint", ckpt_path,
            "--whiten", "",          # no whitening
            "--gpu", "-1",
            "--out-json", out_json,
        ])
        assert set(res) >= {"mAP-easy", "mAP-medium", "mAP-hard"}
        data = json.load(open(out_json))
        assert f"Synthetic('{synth_root}')" in data

    def test_eval_with_whiten_and_aqe(self, synth_root, ckpt_path):
        from dirjax.cli.test_dir import main

        res = main([
            "--dataset", f"Synthetic('{synth_root}')",
            "--checkpoint", ckpt_path,
            "--whiten", "Landmarks_clean", "--whitenp", "0.25",
            "--aqe", "2", "3",
            "--gpu", "-1",
        ])
        assert "mAP-medium" in res

    def test_missing_whitening_name_errors(self, synth_root, ckpt_path):
        from dirjax.cli.test_dir import main

        with pytest.raises(KeyError, match="no whitening"):
            main(["--dataset", f"Synthetic('{synth_root}')",
                  "--checkpoint", ckpt_path,
                  "--whiten", "NoSuchPCA", "--gpu", "-1"])


class TestExtractFeaturesCLI:
    def test_extract(self, synth_root, ckpt_path, tmp_path):
        from dirjax.cli.extract_features import main

        out = str(tmp_path / "feats.npy")
        main([
            "--dataset", f"Synthetic('{synth_root}')",
            "--checkpoint", ckpt_path,
            "--output", out, "--gpu", "-1",
        ])
        # Synthetic has a separate query db -> two files
        db = np.load(str(tmp_path / "feats.dbdescs.npy"))
        q = np.load(str(tmp_path / "feats.qdescs.npy"))
        assert db.shape == (14, 32)
        assert q.shape == (3, 32)
        np.testing.assert_allclose(np.linalg.norm(db, axis=1), 1.0, rtol=1e-4)

    def test_extract_imagelist(self, synth_root, ckpt_path, tmp_path):
        # plain ImageList has no query db -> single output file
        from dirjax.cli.extract_features import main

        jpg = os.path.join(synth_root, "revisited", "jpg")
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(sorted(os.listdir(jpg))[:4]) + "\n")
        out = str(tmp_path / "il.npy")
        main([
            "--dataset", f"ImageList('{lst}', root='{jpg}')",
            "--checkpoint", ckpt_path,
            "--output", out, "--gpu", "-1",
        ])
        assert np.load(out).shape == (4, 32)


class TestModuleMains:
    def test_models_main(self):
        out = subprocess.run(
            [sys.executable, "-m", "dirjax.models"], capture_output=True,
            text=True, cwd="/root/repo",
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert "resnet101_rmac" in out.stdout

    def test_kapture_requires_package(self, ckpt_path, monkeypatch):
        # another test file may have installed the kapture SHIM into
        # sys.modules (order-dependent leak); this test is specifically
        # about the package being ABSENT
        monkeypatch.delitem(sys.modules, "kapture", raising=False)
        monkeypatch.delitem(sys.modules, "kapture.io.csv", raising=False)
        monkeypatch.delitem(sys.modules, "kapture.io.features",
                            raising=False)
        from dirjax.cli.extract_kapture import extract_kapture_global_features

        with pytest.raises(ImportError, match="kapture"):
            extract_kapture_global_features("/nonexistent", None, "t", "")


def test_fit_whitening_cli(tmp_path):
    """train -> fit_whitening -> test_dir --whiten: the full own-model
    pipeline the reference implies but never shipped (its checkpoints'
    PCA was fitted internally)."""
    import jax
    import numpy as np

    from dirjax.cli.fit_whitening import main as fw_main
    from dirjax.models import create_model
    from dirjax.utils.checkpoints import Checkpoint, load_native, save_native

    model = create_model("resnet18_rmac", out_dim=16)
    ck = Checkpoint(model=model, params=model.init(jax.random.PRNGKey(0)),
                    preprocess=model.preprocess)
    src = str(tmp_path / "ck.npz")
    out = str(tmp_path / "ck_whitened.npz")
    save_native(src, ck)

    fw_main(["--dataset", "SyntheticLabels", "--checkpoint", src,
             "--name", "SynClean", "--out", out,
             "--trfs", "Scale(48), CenterCrop(48)", "--max-images", "16",
             "--gpu", "-1"])
    back = load_native(out)
    assert "SynClean" in back.pca
    pca = back.pca["SynClean"]
    assert pca.components.shape[1] == 16 and np.all(np.isfinite(pca.mean))

    # --device-fit takes the streamed-covariance path; same descriptors,
    # so the fitted PCA must agree with the host SVD fit
    out_dev = str(tmp_path / "ck_whitened_dev.npz")
    fw_main(["--dataset", "SyntheticLabels", "--checkpoint", src,
             "--name", "SynClean", "--out", out_dev, "--device-fit",
             "--trfs", "Scale(48), CenterCrop(48)", "--max-images", "16",
             "--gpu", "-1"])
    pca_dev = load_native(out_dev).pca["SynClean"]
    np.testing.assert_allclose(pca_dev.mean, pca.mean, atol=1e-5)
    # with N=12 samples the covariance has rank 11: the last component is
    # null-space (variance ~0, direction arbitrary) — compare the rest
    assert pca_dev.components.shape == pca.components.shape
    np.testing.assert_allclose(np.abs(pca_dev.components[:-1]),
                               np.abs(pca.components[:-1]), atol=2e-3)

    from dirjax.cli.test_dir import main as td_main

    res = td_main(["--dataset", "Synthetic", "--checkpoint", out,
                   "--whiten", "SynClean", "--whitenp", "0.25",
                   "--trfs", "Scale(64)", "--gpu", "-1"])
    assert 0.0 <= res["mAP-medium"] <= 1.0


class TestIndexCLI:
    """python -m dirjax.index: the extract_features -> build -> query loop
    (beyond-reference serving surface)."""

    def _descs(self, tmp_path, n=64, d=32):
        import numpy as np

        rng = np.random.default_rng(0)
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        dp = str(tmp_path / "feats.dbdescs.npy")
        qp = str(tmp_path / "feats.qdescs.npy")
        np.save(dp, db)
        np.save(qp, db[:5])       # queries = first rows: top-1 self-match
        kp = str(tmp_path / "keys.txt")
        open(kp, "w").write("\n".join(f"img{i}.jpg" for i in range(n)))
        return dp, qp, kp

    def test_build_query_roundtrip(self, tmp_path):
        import json

        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        ip = str(tmp_path / "index.npz")
        main(["build", "--descs", dp, "--keys", kp, "--out", ip,
              "--gpu", "-1"])
        oj = str(tmp_path / "hits.json")
        main(["query", "--index", ip, "--descs", qp, "-k", "3",
              "--out-json", oj, "--gpu", "-1"])
        res = json.load(open(oj))
        assert [row[0] for row in res["keys"]] == \
            [f"img{i}.jpg" for i in range(5)]

    def test_int8_build_and_aqe_query(self, tmp_path):
        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        ip = str(tmp_path / "i8.npz")
        main(["build", "--descs", dp, "--int8", "--out", ip, "--gpu", "-1"])
        out = main(["query", "--index", ip, "--descs", qp, "-k", "3",
                    "--aqe", "4", "3", "--int8-queries", "--gpu", "-1"])
        assert [row[0] for row in out["indices"]] == [0, 1, 2, 3, 4]

    def test_adc_bf16_query(self, tmp_path):
        import pytest

        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        ip = str(tmp_path / "pq.npz")
        main(["build", "--descs", dp, "--pq", "8", "--out", ip,
              "--gpu", "-1"])
        out = main(["query", "--index", ip, "--descs", qp, "-k", "3",
                    "--adc-bf16", "--gpu", "-1"])
        # ADC on 64 rows at bf16 precision: self-match must still win
        assert [row[0] for row in out["indices"]] == [0, 1, 2, 3, 4]

        # flat indexes have no ADC contraction: flag must refuse
        fp = str(tmp_path / "flat.npz")
        main(["build", "--descs", dp, "--out", fp, "--gpu", "-1"])
        with pytest.raises(SystemExit, match="PQ/IVF"):
            main(["query", "--index", fp, "--descs", qp,
                  "--adc-bf16", "--gpu", "-1"])

    def test_add_subcommand_grows_and_serves(self, tmp_path):
        import numpy as np

        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        ip = str(tmp_path / "grow.npz")
        main(["build", "--descs", dp, "--keys", kp, "--out", ip,
              "--gpu", "-1"])
        rng = np.random.default_rng(7)
        new = rng.standard_normal((3, 32)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        npth = str(tmp_path / "new.npy")
        np.save(npth, new)
        nk = str(tmp_path / "newkeys.txt")
        open(nk, "w").write("\n".join(f"new{i}.jpg" for i in range(3)))
        idx = main(["add", "--index", ip, "--descs", npth, "--keys", nk,
                    "--gpu", "-1"])
        assert idx.n == 67 and idx.keys[-1] == "new2.jpg"
        # the rewritten file serves the appended rows
        nq = str(tmp_path / "newq.npy")
        np.save(nq, new[:1])
        out = main(["query", "--index", ip, "--descs", nq, "-k", "1",
                    "--gpu", "-1"])
        assert out["keys"][0][0] == "new0.jpg"

    def test_add_subcommand_pq_out_path(self, tmp_path):
        import numpy as np

        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        ip = str(tmp_path / "pqgrow.npz")
        main(["build", "--descs", dp, "--pq", "8", "--out", ip,
              "--gpu", "-1"])
        op = str(tmp_path / "pqgrown.npz")
        idx = main(["add", "--index", ip, "--descs", qp, "--out", op,
                    "--gpu", "-1"])
        assert idx.n == 69
        # --out leaves the source index untouched
        import dirjax.serving as serving

        assert serving.RetrievalIndex.load(ip).n == 64
        assert serving.RetrievalIndex.load(op).n == 69

    def test_key_count_mismatch_asserts(self, tmp_path):
        import pytest

        from dirjax.cli.index import main

        dp, qp, kp = self._descs(tmp_path)
        open(kp, "a").write("\nextra.jpg")
        with pytest.raises(AssertionError, match="keys"):
            main(["build", "--descs", dp, "--keys", kp,
                  "--out", str(tmp_path / "x.npz"), "--gpu", "-1"])
