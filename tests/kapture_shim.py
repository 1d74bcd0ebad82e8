"""Minimal fake-kapture package for exercising the extract_kapture path.

The real ``kapture`` SFM toolkit isn't installable in the zero-egress
sandbox; this shim reproduces just the public API surface that
``dirjax.cli.extract_kapture`` touches, over a simple on-disk layout:

    <root>/sensors/records_data/<image files>
    <root>/reconstruction/global_features/<type>/<image>.gfeat  (fp32 blobs)

Call :func:`install` before importing the CLI module. The shim's
``kapture_from_dir`` scans both directories, so skip-already-done logic is
exercised for real.
"""

import contextlib
import os
import sys
import types

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png")


class _SensorRecords(dict):
    """timestamp -> {camera_id: image_name}"""


class GlobalFeatures:
    def __init__(self, name, dtype, dsize, metric_type):
        self.name = name
        self.dtype = np.dtype(dtype)
        self.dsize = int(dsize)
        self.metric_type = metric_type
        self._names = set()

    def add(self, name):
        self._names.add(name)

    def __contains__(self, name):
        return name in self._names

    def __iter__(self):
        return iter(sorted(self._names))

    def __len__(self):
        return len(self._names)


class Keypoints:  # markers used only in skip lists / tar modes
    pass


class Descriptors:
    pass


class Matches:
    pass


class Points3d:
    pass


class Observations:
    pass


class _Kapture:
    def __init__(self):
        self.records_camera = _SensorRecords()
        self.global_features = None


def flatten(records):
    for ts in sorted(records):
        for cam, name in sorted(records[ts].items()):
            yield ts, cam, name


# --- io paths --------------------------------------------------------------

def _records_dir(root):
    return os.path.join(root, "sensors", "records_data")


def _features_dir(root, ftype):
    return os.path.join(root, "reconstruction", "global_features", ftype)


def get_image_fullpath(root, image_filename=None):
    base = _records_dir(root)
    return base if image_filename is None else os.path.join(base, image_filename)


def get_global_features_fullpath(ftype, root, image_name, tar_handlers=None):
    return os.path.join(_features_dir(root, ftype), image_name + ".gfeat")


def get_feature_csv_fullpath(kind, ftype, root):
    return os.path.join(_features_dir(root, ftype), "global_features.txt")


def global_features_to_file(path, gfeat):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(f"{gfeat.name}, {gfeat.dtype.name}, {gfeat.dsize}, "
                f"{gfeat.metric_type}\n")


def image_global_features_to_file(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.asarray(arr).tofile(path)


def global_features_check_dir(gfeat, ftype, root, tar_handlers=None):
    return all(os.path.isfile(get_global_features_fullpath(ftype, root, n))
               for n in gfeat)


@contextlib.contextmanager
def get_all_tar_handlers(root, mode=None):
    yield None


def kapture_from_dir(root, _=None, skip_list=(), tar_handlers=None):
    kdata = _Kapture()
    rec_dir = _records_dir(root)
    names = sorted(f for f in os.listdir(rec_dir)
                   if f.lower().endswith(IMAGE_EXTS))
    for i, name in enumerate(names):
        kdata.records_camera.setdefault(i, {})["cam0"] = name

    feat_root = os.path.join(root, "reconstruction", "global_features")
    if os.path.isdir(feat_root):
        kdata.global_features = {}
        for ftype in os.listdir(feat_root):
            csv = get_feature_csv_fullpath(None, ftype, root)
            if not os.path.isfile(csv):
                continue
            fname, dtype, dsize, metric = [
                s.strip() for s in open(csv).read().split(",")]
            gf = GlobalFeatures(fname, dtype, int(dsize), metric)
            for cur, _dirs, files in os.walk(_features_dir(root, ftype)):
                for f in files:
                    if f.endswith(".gfeat"):
                        rel = os.path.relpath(os.path.join(cur, f),
                                              _features_dir(root, ftype))
                        gf.add(rel[: -len(".gfeat")])
            kdata.global_features[ftype] = gf
    return kdata


def install() -> None:
    """Register the fake ``kapture``/``kapture.io.*`` modules (no-op when a
    real kapture is importable)."""
    try:
        import kapture  # noqa: F401
        return
    except ImportError:
        pass
    this = sys.modules[__name__]
    kap = types.ModuleType("kapture")
    for sym in ("Keypoints", "Descriptors", "Matches", "Points3d",
                "Observations", "GlobalFeatures", "flatten"):
        setattr(kap, sym, getattr(this, sym))
    io = types.ModuleType("kapture.io")
    csv = types.ModuleType("kapture.io.csv")
    for sym in ("get_all_tar_handlers", "get_feature_csv_fullpath",
                "global_features_to_file", "kapture_from_dir"):
        setattr(csv, sym, getattr(this, sym))
    feats = types.ModuleType("kapture.io.features")
    for sym in ("get_global_features_fullpath", "global_features_check_dir",
                "image_global_features_to_file"):
        setattr(feats, sym, getattr(this, sym))
    recs = types.ModuleType("kapture.io.records")
    recs.get_image_fullpath = get_image_fullpath
    kap.io = io
    io.csv = csv
    io.features = feats
    io.records = recs
    for name, mod in [("kapture", kap), ("kapture.io", io),
                      ("kapture.io.csv", csv), ("kapture.io.features", feats),
                      ("kapture.io.records", recs)]:
        sys.modules.setdefault(name, mod)
