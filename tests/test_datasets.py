"""Tests for the dataset layer: registry, generic types, Oxford-style GT,
combinators, and the synthetic fixture."""

import os
import pickle

import numpy as np
import pytest

import dirjax.datasets as D


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("synth"))


@pytest.fixture(scope="module")
def synth(synthetic_root):
    return D.Synthetic(synthetic_root, revisited=True)


@pytest.fixture(scope="module")
def synth_classic(synthetic_root):
    return D.Synthetic(synthetic_root, revisited=False)


class TestRegistry:
    def test_available_contains_benchmarks(self):
        names = D.available()
        for expected in ["Oxford5K", "ROxford5K", "Paris6K", "RParis6K",
                         "Landmarks_clean", "Landmarks18", "ImageList",
                         "Synthetic"]:
            assert expected in names

    def test_create_with_args(self, tmp_path):
        lst = tmp_path / "imgs.txt"
        lst.write_text("a.jpg\nb.jpg\n")
        db = D.create(f"ImageList('{lst}')")
        assert len(db) == 2
        assert db.get_key(0) == "a.jpg"

    def test_create_unknown_raises(self):
        with pytest.raises(KeyError, match="unknown dataset"):
            D.create("NoSuchDataset")

    def test_create_rejects_code(self):
        with pytest.raises((ValueError, KeyError)):
            D.create("__import__('os').system('true')")

    def test_db_root_required_lazily(self, monkeypatch):
        monkeypatch.delenv("DB_ROOT", raising=False)
        with pytest.raises(EnvironmentError):
            D.create("Oxford5K")


class TestImageListLabels:
    @pytest.fixture
    def db(self, tmp_path):
        lst = tmp_path / "train.txt"
        lst.write_text("a.jpg cat\nb.jpg dog\nc.jpg cat\n")
        return D.ImageListLabels(str(lst), root=str(tmp_path))

    def test_classes(self, db):
        assert db.nclass == 2
        assert sorted(db.classes) == ["cat", "dog"]
        assert db.get_label(0) == "cat"
        assert isinstance(db.get_label(0, toint=True), int)

    def test_relevants(self, db):
        assert db.c_relevant_idx["cat"] == [0, 2]

    def test_query_gt_marks_self_junk(self, db):
        gt = db.get_query_groundtruth(0)
        assert gt[0] == 0  # self is junk
        assert gt[2] == 1
        assert gt[1] == -1

    def test_eval_query_top(self, db):
        scores = np.array([0.9, 0.1, 0.8])
        tops = db.eval_query_top(0, scores, k=(1, 2))
        assert tops[1] == 1.0

    def test_json_flavor(self, tmp_path):
        import json
        p = tmp_path / "train.json"
        p.write_text(json.dumps({"a.jpg": "cat", "b.jpg": "dog"}))
        db = D.ImageListLabels(str(p))
        assert db.nclass == 2


class TestSynthetic:
    def test_structure(self, synth):
        assert synth.nimg == 3 * 4 + 2
        assert synth.nquery == 3
        assert synth.relevants is None  # revisited flavor
        assert len(synth.easy[0]) + len(synth.hard[0]) == 4

    def test_images_load(self, synth):
        img = synth.get_image(0)
        assert img.size == (64, 48)
        qdb = synth.get_query_db()
        qimg = qdb.get_image(0)  # ROI-cropped
        assert qimg.size == (60, 44)

    def test_gt_modes(self, synth):
        gt_med = synth.get_query_groundtruth(0, "AP", "medium")
        assert (gt_med == 1).sum() == 4
        assert (gt_med == 0).sum() == 2  # global junk
        gt_easy = synth.get_query_groundtruth(0, "AP", "easy")
        # hard positives become junk in easy mode
        assert (gt_easy == 0).sum() == 2 + len(synth.hard[0])

    def test_eval_query_ap_dict(self, synth):
        scores = np.linspace(1, 0, synth.nimg)
        res = synth.eval_query_AP(0, scores)
        assert set(res) == {"easy", "medium", "hard"}

    def test_perfect_ranking_gives_map_1(self, synth):
        # scores that rank all positives of query 0 first -> AP 1 in medium
        gt = synth.get_query_groundtruth(0, "AP", "medium")
        scores = (gt == 1).astype(float) + 0.001 * np.random.default_rng(0).random(synth.nimg)
        res = synth.eval_query_AP(0, scores)
        assert res["medium"] == pytest.approx(1.0)

    def test_classic_flavor(self, synth_classic):
        assert synth_classic.relevants is not None
        scores = np.linspace(1, 0, synth_classic.nimg)
        ap = synth_classic.eval_query_AP(0, scores)
        assert isinstance(ap, float)

    def test_reference_loads_our_pickle(self, synthetic_root):
        """The synthetic GT pickle must be byte-compatible with the
        reference's ImageListRelevants reader."""
        gt_file = os.path.join(synthetic_root, "revisited", "gnd_synthetic.pkl")
        with open(gt_file, "rb") as f:
            gt = pickle.load(f)
        assert set(gt) == {"imlist", "qimlist", "gnd"}
        assert {"bbx", "junk", "easy", "hard"} <= set(gt["gnd"][0])


class TestCombinators:
    @pytest.fixture
    def labeled(self, tmp_path):
        rows = [f"img{i}.jpg cls{i % 3}" for i in range(30)]
        lst = tmp_path / "train.txt"
        lst.write_text("\n".join(rows) + "\n")
        return D.ImageListLabels(str(lst), root=str(tmp_path))

    def test_split_balanced(self, labeled):
        train, test = D.split(labeled, train_prop=0.8)
        assert len(train) + len(test) == len(labeled)
        assert len(train) > len(test)
        # every class has at least one training sample
        train_labels = {train.get_label(i) for i in range(len(train))}
        assert train_labels == set(labeled.classes)

    def test_split_hash_stable(self, labeled):
        t1, _ = D.split(labeled, train_prop=0.5, method="hash")
        t2, _ = D.split(labeled, train_prop=0.5, method="hash")
        assert t1.indices == t2.indices

    def test_split_with_val(self, labeled):
        train, val, test = D.split(labeled, 0.6, val_prop=0.2)
        assert len(train) + len(val) + len(test) == len(labeled)
        assert len(val) > 0

    def test_subdataset_forwards(self, labeled):
        sub = D.SubDataset(labeled, [0, 5, 10])
        assert len(sub) == 3
        assert sub.get_key(1) == labeled.get_key(5)
        assert sub.get_label(2) == labeled.get_label(10)

    def test_cat_dataset(self, tmp_path):
        for sub in ("a", "b"):
            d = tmp_path / sub
            d.mkdir()
            (d / "train.txt").write_text("x.jpg c0\ny.jpg c1\n")
        d1 = D.ImageListLabels(str(tmp_path / "a" / "train.txt"), root=str(tmp_path / "a"))
        d2 = D.ImageListLabels(str(tmp_path / "b" / "train.txt"), root=str(tmp_path / "b"))
        d2.find_classes(d1.classes, **d1.cls_idx)
        d2.classes = d1.classes
        cat = D.CatDataset(d1, d2)
        assert len(cat) == 4
        assert cat.get_label(3) == "c1"
        # keys are re-rooted below the common prefix
        assert cat.get_key(0).startswith("a")
        assert cat.get_key(2).startswith("b")
        assert cat.c_relevant_idx["c0"] == [0, 2]

    def test_deploy_roundtrip(self, synth, tmp_path):
        cache = str(tmp_path / "cache")
        deployed = D.deploy(synth, cache)
        assert len(deployed) == len(synth)
        # deployed images exist on disk and load
        img = deployed.get_image(0)
        assert img.size == (64, 48)
        # second deploy reuses the cache without error
        deployed2 = D.deploy(synth, cache)
        assert len(deployed2) == len(synth)


class TestKeyToIndex:
    def test_cache(self, synth):
        key = synth.get_key(3)
        assert synth.key_to_index(key) == 3
