"""Benchmark dataset downloader.

Fetches the Oxford/Paris image archives and the Revisited ground-truth
pickles into $DB_ROOT (reference ``dirtorch/datasets/downloader.py:6-52``),
using subprocess instead of shell string interpolation.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tarfile

from .registry import db_root

_SOURCES = {
    "oxford5k": ("http://www.robots.ox.ac.uk/~vgg/data/oxbuildings",
                 ["oxbuild_images.tgz"], "oxford5k"),
    "roxford5k": ("http://www.robots.ox.ac.uk/~vgg/data/oxbuildings",
                  ["oxbuild_images.tgz"], "oxford5k"),
    "paris6k": ("http://www.robots.ox.ac.uk/~vgg/data/parisbuildings",
                ["paris_1.tgz", "paris_2.tgz"], "paris6k"),
    "rparis6k": ("http://www.robots.ox.ac.uk/~vgg/data/parisbuildings",
                 ["paris_1.tgz", "paris_2.tgz"], "paris6k"),
}

_GND_BASE = "http://cmp.felk.cvut.cz/cnnimageretrieval/data/test"


def _wget(url: str, dst: str) -> None:
    subprocess.run(["wget", "-q", url, "-O", dst], check=True)


def download_dataset(dataset: str) -> None:
    """Download images + GT for a known benchmark; no-op for others or when
    already present."""
    dataset = dataset.lower()
    if dataset not in _SOURCES:
        return

    root = db_root()
    os.makedirs(root, exist_ok=True)
    src_dir, archives, dir_name = _SOURCES[dataset]

    jpg_dir = os.path.join(root, dir_name, "jpg")
    if not os.path.isdir(jpg_dir):
        print(f">> Dataset {dataset} directory missing; creating {jpg_dir}")
        os.makedirs(jpg_dir, exist_ok=True)
        for archive in archives:
            dst_file = os.path.join(jpg_dir, archive)
            print(f">> Downloading {archive}...")
            _wget(f"{src_dir}/{archive}", dst_file)
            print(f">> Extracting {archive}...")
            tmp = os.path.join(jpg_dir, "tmp")
            os.makedirs(tmp, exist_ok=True)
            with tarfile.open(dst_file, "r:gz") as tar:
                tar.extractall(tmp)
            # flatten: images may sit inside subfolders
            for cur, _dirs, files in os.walk(tmp):
                for f in files:
                    shutil.move(os.path.join(cur, f), os.path.join(jpg_dir, f))
            shutil.rmtree(tmp)
            os.remove(dst_file)

    gnd_file = os.path.join(root, dir_name, f"gnd_{dataset}.pkl")
    if not os.path.exists(gnd_file):
        print(f">> Downloading {dataset} ground truth...")
        _wget(f"{_GND_BASE}/{dataset}/gnd_{dataset}.pkl", gnd_file)
