"""Generic dataset types.

Parity with the reference ``dirtorch/datasets/generic.py``:

* :class:`ImageList` — plain list of image paths (generic.py:13-30)
* :class:`ImageListLabels` / :class:`ImageListLabelsQ` /
  :class:`ImagesAndLabels` — class-labeled lists (generic.py:44-121)
* :class:`ImageListRelevants` — Oxford/Paris-style pickle ground truth with
  per-query relevant/junk lists and the Revisited easy/medium/hard protocol
  (generic.py:124-224)
* :class:`ImageListROIs` — query images cropped to their bounding box
  (generic.py:227-250)
* :class:`ImageClusters` / :class:`NullCluster` — JSON img->cluster maps
  (generic.py:257-299)
"""

from __future__ import annotations

import json
import os
import os.path as osp
import pickle
from typing import Optional

import numpy as np

from ..utils import evaluation as ev
from .base import Dataset, find_and_list_classes, find_relevants

__all__ = [
    "ImageList",
    "LabelledDataset",
    "ImageListLabels",
    "ImageListLabelsQ",
    "ImagesAndLabels",
    "ImageListRelevants",
    "ImageListROIs",
    "ImageClusters",
    "NullCluster",
]


class ImageList(Dataset):
    """A bare list of images: one path per row of a text file, or an
    explicit list via ``imgs=``. No labels, no queries."""

    def __init__(self, img_list_path: str = "", root: str = "", imgs=None):
        self.root = root
        if imgs is not None:
            self.imgs = list(imgs)
        else:
            with open(img_list_path) as f:
                self.imgs = [line.strip() for line in f if line.strip()]
        self.nimg = len(self.imgs)
        self.nclass = 0
        self.nquery = 0

    def get_key(self, i: int) -> str:
        return self.imgs[i]


class LabelledDataset(Dataset):
    """A dataset with per-image class labels."""

    def find_classes(self, labels=None, **cls_idx):
        labels = labels if labels is not None else self.labels
        self.classes, self.cls_idx = find_and_list_classes(labels, cls_idx=cls_idx)
        self.nclass = len(self.classes)
        self.c_relevant_idx = find_relevants(self.labels)


class ImageListLabels(LabelledDataset):
    """Images + labels from a .txt ('path label' rows) or .json ({path: label})."""

    def __init__(self, img_list_path: str, root: Optional[str] = None):
        self.root = root
        ext = osp.splitext(img_list_path)[1]
        if ext == ".txt":
            with open(img_list_path) as f:
                rows = [line.strip().split(" ") for line in f if line.strip()]
            self.imgs = [r[0] for r in rows]
            self.labels = [r[1] for r in rows]
        elif ext == ".json":
            with open(img_list_path) as f:
                data = json.load(f)
            self.imgs = list(data.keys())
            self.labels = list(data.values())
        else:
            raise ValueError(f"unsupported annotation file: {img_list_path}")
        self.find_classes()
        self.nimg = len(self.imgs)
        self.nquery = 0

    def get_key(self, i: int) -> str:
        return self.imgs[i]

    def get_label(self, i: int, toint: bool = False):
        label = self.labels[i]
        return self.cls_idx[label] if toint else label

    def get_query_db(self):
        return self


class ImageListLabelsQ(ImageListLabels):
    """Labeled database + a separate labeled query list."""

    def __init__(self, img_list_path: str, query_list_path: str,
                 root: Optional[str] = None):
        self.root = root
        with open(img_list_path) as f:
            rows = [line.strip().split(" ") for line in f if line.strip()]
        self.imgs = [r[0] for r in rows]
        self.labels = [r[1] for r in rows]
        with open(query_list_path) as f:
            rows = [line.strip().split(" ") for line in f if line.strip()]
        self.qimgs = [r[0] for r in rows]
        self.qlabels = [r[1] for r in rows]
        self.find_classes()
        self.nimg = len(self.imgs)
        self.nquery = len(self.qimgs)

    def find_classes(self, labels=None, **cls_idx):
        labels = labels if labels is not None else self.labels + self.qlabels
        self.classes, self.cls_idx = find_and_list_classes(labels, cls_idx=cls_idx)
        self.nclass = len(self.classes)
        self.c_relevant_idx = find_relevants(self.labels)

    def get_query_db(self):
        return ImagesAndLabels(self.qimgs, self.qlabels, self.cls_idx, root=self.root)


class ImagesAndLabels(ImageListLabels):
    """Explicit (imgs, labels) arrays sharing a parent's class map."""

    def __init__(self, imgs, labels, cls_idx, root: Optional[str] = None):
        self.root = root
        self.imgs = list(imgs)
        self.labels = list(labels)
        self.cls_idx = cls_idx
        self.nclass = len(cls_idx)
        self.nimg = len(self.imgs)
        self.nquery = 0


class ImageListRelevants(Dataset):
    """Oxford-style ground truth from a pickle file.

    The pickle holds ``imlist``, ``qimlist`` and per-query ``gnd`` entries
    with a query bounding box ``bbx`` plus either a single ``ok`` list
    (classic protocol) or ``easy``/``hard`` lists (Revisited protocol), and
    always a ``junk`` list. Scores for junk images are removed before AP.
    """

    def __init__(self, gt_file: str, root: Optional[str] = None,
                 img_dir: str = "jpg", ext: str = ".jpg"):
        self.root = root
        self.img_dir = img_dir

        with open(gt_file, "rb") as f:
            gt = pickle.load(f)

        def with_ext(name):
            stem, e = osp.splitext(name)
            return stem + (e if e else ext)

        self.imgs = [with_ext(e) for e in gt["imlist"]]
        self.qimgs = [with_ext(e) for e in gt["qimlist"]]
        self.qroi = [tuple(e["bbx"]) for e in gt["gnd"]]
        if "ok" in gt["gnd"][0]:
            self.relevants = [e["ok"] for e in gt["gnd"]]
            self.easy = self.hard = None
        else:
            self.relevants = None
            self.easy = [e["easy"] for e in gt["gnd"]]
            self.hard = [e["hard"] for e in gt["gnd"]]
        self.junk = [e["junk"] for e in gt["gnd"]]

        self.nimg = len(self.imgs)
        self.nquery = len(self.qimgs)

    # --- GT accessors (reference generic.py:150-170) ------------------
    def get_relevants(self, q: int, mode: str = "classic"):
        if mode == "classic":
            return self.relevants[q]
        if mode == "easy":
            return self.easy[q]
        if mode == "medium":
            return self.easy[q] + self.hard[q]
        if mode == "hard":
            return self.hard[q]
        raise ValueError(mode)

    def get_junk(self, q: int, mode: str = "classic"):
        if mode in ("classic", "medium"):
            return self.junk[q]
        if mode == "easy":
            return self.junk[q] + self.hard[q]
        if mode == "hard":
            return self.junk[q] + self.easy[q]
        raise ValueError(mode)

    # --- keys / queries ----------------------------------------------
    def get_key(self, i: int) -> str:
        return self.imgs[i]

    def get_query_key(self, i: int) -> str:
        return self.qimgs[i]

    def get_query_filename(self, q: int, root: Optional[str] = None) -> str:
        return os.path.join(root or self.root, self.img_dir, self.get_query_key(q))

    def get_query_roi(self, q: int):
        return self.qroi[q]

    def get_query_db(self):
        return ImageListROIs(self.root, self.img_dir, self.qimgs, self.qroi)

    # --- evaluation ---------------------------------------------------
    def get_query_groundtruth(self, query_idx: int, what: str = "AP",
                              mode: str = "classic"):
        gt = -np.ones(self.nimg, dtype=np.int8)
        gt[self.get_relevants(query_idx, mode)] = 1
        gt[self.get_junk(query_idx, mode)] = 0
        return gt

    def eval_query_AP(self, query_idx: int, scores: np.ndarray):
        """Revisited trapezoidal AP; dict over easy/medium/hard when the GT
        is in Revisited format, scalar for classic GT."""
        if self.relevants is not None:
            gt = self.get_query_groundtruth(query_idx, "AP")
            ap = ev.ap_from_gt_scores(gt, scores)
            # classic protocol scores a query with no positives as AP 0
            return max(ap, 0.0)
        res = {}
        for mode in ("easy", "medium", "hard"):
            gt = self.get_query_groundtruth(query_idx, "AP", mode)
            res[mode] = ev.ap_from_gt_scores(gt, scores)
        return res


class ImageListROIs(Dataset):
    """Images cropped to a per-image region of interest at load time —
    used for the query side of Oxford/Paris benchmarks."""

    def __init__(self, root, img_dir, imgs, rois):
        self.root = root
        self.img_dir = img_dir
        self.imgs = list(imgs)
        self.rois = list(rois)
        self.nimg = len(self.imgs)
        self.nclass = 0
        self.nquery = 0

    def get_key(self, i: int) -> str:
        return self.imgs[i]

    def get_roi(self, i: int):
        return self.rois[i]

    def get_image(self, img_idx: int, resize=None):
        from PIL import Image

        img = Image.open(self.get_filename(img_idx)).convert("RGB")
        img = img.crop(self.rois[img_idx])
        if resize:
            method = (
                Image.LANCZOS
                if np.prod(resize) < np.prod(img.size)
                else Image.BICUBIC
            )
            img = img.resize(resize, method)
        return img


def _not_none(label):
    return label is not None


class ImageClusters(LabelledDataset):
    """Images + cluster labels from a JSON dict {img_path: cluster}."""

    def __init__(self, json_path, root: Optional[str] = None, filter=_not_none):
        self.root = root
        self.imgs = []
        self.labels = []
        if isinstance(json_path, dict):
            data = json_path
        else:
            with open(json_path) as f:
                data = json.load(f)
            assert isinstance(data, dict), "json content is not a dictionary"
        for img, cls in data.items():
            assert isinstance(img, str)
            if not filter(cls):
                continue
            if type(cls) not in (str, int, type(None)):
                continue
            self.imgs.append(img)
            self.labels.append(cls)
        self.find_classes()
        self.nimg = len(self.imgs)
        self.nquery = 0

    def get_key(self, i: int) -> str:
        return self.imgs[i]

    def get_label(self, i: int, toint: bool = False):
        label = self.labels[i]
        return self.cls_idx[label] if toint else label


class NullCluster(ImageClusters):
    """Only the images whose cluster label is null."""

    def __init__(self, json_path, root: Optional[str] = None):
        super().__init__(json_path, root, lambda c: c is None)
