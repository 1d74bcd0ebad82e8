"""Exercise the two previously-never-run paths: the dataset downloader
(against file:// fixtures — covers the tar-flatten and ground-truth logic
without egress) and the kapture extraction driver (against the fake-kapture
shim in tests/kapture_shim.py)."""

import io
import os
import pickle
import tarfile

import jax
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.datasets.downloader import download_dataset


def _fixture_tarball(path, names, nested=True):
    """A .tgz holding tiny jpegs, optionally inside a nested subfolder (the
    real Oxford archive nests its images)."""
    from PIL import Image

    with tarfile.open(path, "w:gz") as tar:
        for i, name in enumerate(names):
            buf = io.BytesIO()
            Image.fromarray(np.full((8, 8, 3), i * 20, np.uint8)).save(
                buf, format="JPEG")
            data = buf.getvalue()
            arc = f"sub{i % 2}/{name}" if nested else name
            info = tarfile.TarInfo(arc)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


class TestDownloader:
    def test_file_url_download_flatten_and_gnd(self, tmp_path, monkeypatch):
        # stage the remote side
        remote = tmp_path / "remote"
        (remote / "oxford5k").mkdir(parents=True)
        _fixture_tarball(str(remote / "oxbuild_images.tgz"),
                         ["img_c0_0.jpg", "img_c0_1.jpg", "query_c0.jpg"])
        gnd = {"imlist": ["img_c0_0", "img_c0_1"], "qimlist": ["query_c0"],
               "gnd": [{"bbx": (0, 0, 8, 8), "ok": [0, 1], "junk": []}]}
        with open(remote / "oxford5k" / "gnd_oxford5k.pkl", "wb") as f:
            pickle.dump(gnd, f)

        db_root = tmp_path / "dbroot"
        monkeypatch.setenv("DB_ROOT", str(db_root))
        sources = {"oxford5k": (f"file://{remote}", ["oxbuild_images.tgz"],
                                "oxford5k")}
        download_dataset("oxford5k", sources=sources,
                         gnd_base=f"file://{remote}")

        jpg = db_root / "oxford5k" / "jpg"
        # nested archive members were flattened into jpg/
        assert sorted(os.listdir(jpg)) == ["img_c0_0.jpg", "img_c0_1.jpg",
                                           "query_c0.jpg"]
        assert not (jpg / "tmp").exists()
        assert not (jpg / "oxbuild_images.tgz").exists()
        assert (db_root / "oxford5k" / "gnd_oxford5k.pkl").is_file()

        # the downloaded tree is directly consumable by the dataset class
        ds = D.Oxford5K()
        assert len(ds) == 2 and ds.nquery == 1
        ap = ds.eval_query_AP(0, np.array([0.9, 0.8]))
        assert ap == pytest.approx(1.0)

        # second call is a no-op (no re-download)
        download_dataset("oxford5k", sources={"oxford5k": (
            "file:///nonexistent", ["missing.tgz"], "oxford5k")},
            gnd_base="file:///nonexistent")

    def test_unknown_dataset_noop(self, tmp_path, monkeypatch):
        monkeypatch.setenv("DB_ROOT", str(tmp_path))
        download_dataset("Synthetic")  # not in the table: no-op
        assert os.listdir(tmp_path) == []


class TestKapture:
    @pytest.fixture
    def kroot(self, tmp_path):
        from PIL import Image

        rec = tmp_path / "sensors" / "records_data"
        rec.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3)).astype(
                np.uint8)).save(rec / f"frame{i}.jpg")
        return str(tmp_path)

    def test_cli_import_error_without_shim(self, kroot, monkeypatch):
        """Without kapture installed the driver must fail with the clear
        message (the only path round 1 ever exercised — kept as a guard)."""
        import sys

        if "kapture" in sys.modules:
            pytest.skip("kapture (shim) already installed in this process")
        from dirjax.cli.extract_kapture import extract_kapture_global_features

        with pytest.raises(ImportError, match="kapture"):
            extract_kapture_global_features(kroot, None, "t", "")

    def test_extract_and_skip_done(self, kroot, capsys):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import kapture_shim

        kapture_shim.install()

        from dirjax.cli.extract_kapture import extract_kapture_global_features
        from dirjax.extraction import FeatureExtractor
        from dirjax.models import create_model

        model = create_model("resnet18_rmac", out_dim=16)
        params = model.init(jax.random.PRNGKey(0))
        ex = FeatureExtractor(model, params)

        extract_kapture_global_features(kroot, ex, "r18", "")
        fdir = os.path.join(kroot, "reconstruction", "global_features", "r18")
        files = sorted(f for f in os.listdir(fdir) if f.endswith(".gfeat"))
        assert files == [f"frame{i}.jpg.gfeat" for i in range(3)]
        feat = np.fromfile(os.path.join(fdir, files[0]), np.float32)
        assert feat.shape == (16,)
        assert np.linalg.norm(feat) == pytest.approx(1.0, abs=1e-5)

        # second run: everything already extracted
        extract_kapture_global_features(kroot, ex, "r18", "")
        assert "already extracted" in capsys.readouterr().out

