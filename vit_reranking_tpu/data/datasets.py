"""DML datasets: CUB200, Cars196, Stanford Online Products (+ synthetic).

The reference imports a ``datasets`` package that is MISSING from its repo
(SURVEY.md section 0.1); the contract is reconstructed from call sites
(train_baseline.py:44,92-93,194, train_diml.py:109-122, test_diml_cvt.py:78):

  * ``select(name, opt, source_path) -> {'training','testing','evaluation'}``
  * each dataset exposes ``image_dict`` (class -> [(path, idx), ...]),
    ``image_list`` ([(path, class), ...]), ``avail_classes``
  * ``__getitem__`` returns ``(label, image_NHWC_float32, index)``
  * splits follow the RevisitDML convention: first half of classes = train,
    second half = test (CUB 100/100, Cars 98/98, SOP 11318/11316)

A ``synthetic`` dataset (procedural class-colored noise images) is included
for tests and zero-egress smoke runs.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .transforms import EvalTransform, TrainTransform


class ImageDataset:
    """Path-list dataset with the reference's attribute contract."""

    def __init__(self, image_list, transform, n_total_classes=None):
        # image_list: [(path_or_None, class), ...]
        self.image_list = list(image_list)
        self.transform = transform
        self.image_dict: Dict[int, List[Tuple[str, int]]] = defaultdict(list)
        for idx, (path, cls) in enumerate(self.image_list):
            self.image_dict[cls].append((path, idx))
        self.image_dict = dict(self.image_dict)
        self.avail_classes = sorted(self.image_dict.keys())
        self.n_classes = n_total_classes or len(self.avail_classes)
        self.is_validation = False

    def __len__(self):
        return len(self.image_list)

    def load_image(self, idx: int) -> np.ndarray:
        path, _ = self.image_list[idx]
        return self.transform(Image.open(path))

    def __getitem__(self, idx: int):
        label = self.image_list[idx][1]
        return label, self.load_image(idx), idx


class SyntheticDataset(ImageDataset):
    """Procedural dataset: each class is a distinct smooth color/texture
    pattern + noise; separable enough that retrieval metrics are meaningful.

    ``sep`` < 1 shrinks every class prototype toward one shared prototype
    (classes become fine-grained variations of a common pattern) and adds a
    per-image random gain/shift nuisance, so stage-0 R@1 lands mid-range
    instead of saturating at 100 — the discriminative operating point the
    quality-parity runs need (VERDICT r4 item 3).  ``sep=1.0`` (default)
    reproduces the legacy images bit-for-bit (the shared prototype is only
    drawn when sep != 1, leaving the prototype RNG stream untouched)."""

    def __init__(self, n_classes=8, per_class=16, size=224, seed=0, train=True,
                 sep=1.0, noise=0.35, nuisance=1.0):
        self.size = size
        self.seed = seed
        self.sep = float(sep)
        self.noise = float(noise)
        # scale of the gain/shift nuisance (active whenever sep != 1.0):
        # calibration on the chip showed nuisance=1.0 cliffs from-scratch
        # training from R@1 100 (sep=1.0, nuisance off) straight to ~10
        # regardless of sep — the affine invariance, not the class overlap,
        # is the hard part.  A sub-1 scale sets the mid-range operating
        # point the quality-parity runs need (VERDICT r4 item 3).
        self.nuisance = float(nuisance)
        image_list = [
            (None, c) for c in range(n_classes) for _ in range(per_class)
        ]
        super().__init__(image_list, transform=None)
        rng = np.random.default_rng(seed)
        protos = rng.uniform(-1, 1, (n_classes, 4, 4, 3))
        if self.sep != 1.0:
            shared = rng.uniform(-1, 1, (1, 4, 4, 3))
            protos = shared + self.sep * (protos - shared)
        self._protos = protos.astype(np.float32)

    def load_image(self, idx: int) -> np.ndarray:
        cls = self.image_list[idx][1]
        rng = np.random.default_rng(self.seed * 100003 + idx)
        base = self._protos[cls]
        img = np.kron(base, np.ones((self.size // 4, self.size // 4, 1), np.float32))
        img = img + self.noise * rng.standard_normal(img.shape).astype(np.float32)
        if self.sep != 1.0:
            # per-image global gain/shift nuisance: shared across classes, so
            # it carries no label signal but dominates naive color statistics
            gain = 1.0 + 0.25 * self.nuisance * rng.standard_normal()
            shift = 0.3 * self.nuisance * rng.standard_normal((1, 1, 3))
            img = gain * img + shift.astype(np.float32)
        return img.astype(np.float32)


def _cub200_lists(source_path):
    img_root = os.path.join(source_path, "images")
    classes = sorted(os.listdir(img_root))
    files = {
        c: sorted(
            os.path.join(img_root, c, f)
            for f in os.listdir(os.path.join(img_root, c))
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        for c in classes
    }
    train_classes = classes[: len(classes) // 2]
    test_classes = classes[len(classes) // 2 :]
    mk = lambda cs: [
        (p, ci) for ci, c in enumerate(cs) for p in files[c]
    ]
    return mk(train_classes), mk(test_classes)


def _cars196_lists(source_path):
    img_root = os.path.join(source_path, "images")
    if os.path.isdir(img_root):
        return _cub200_lists(source_path)  # same per-class-dir layout
    raise FileNotFoundError(f"cars196 images/ not found under {source_path}")


def _sop_lists(source_path):
    def parse(fname):
        out = []
        with open(os.path.join(source_path, fname)) as f:
            next(f)  # header
            for line in f:
                _, class_id, _, path = line.strip().split(" ")
                out.append((os.path.join(source_path, path), int(class_id) - 1))
        return out

    train = parse("Ebay_train.txt")
    test = parse("Ebay_test.txt")
    # remap test class ids to be 0-based contiguous
    t_classes = sorted({c for _, c in test})
    remap = {c: i for i, c in enumerate(t_classes)}
    test = [(p, remap[c]) for p, c in test]
    tr_classes = sorted({c for _, c in train})
    remap_tr = {c: i for i, c in enumerate(tr_classes)}
    train = [(p, remap_tr[c]) for p, c in train]
    return train, test


def select(name: str, opt, source_path: Optional[str] = None):
    """Dataset dispatcher (contract of the reference's missing datasets pkg)."""
    source_path = source_path or os.path.join(opt.source_path, name)
    aug = getattr(opt, "augmentation", "base")
    seed = getattr(opt, "seed", 0)

    if name == "synthetic":
        n_cls = getattr(opt, "synthetic_classes", 8)
        per = getattr(opt, "synthetic_per_class", 16)
        size = getattr(opt, "synthetic_size", 224)
        sep = getattr(opt, "synthetic_sep", 1.0)
        noise = getattr(opt, "synthetic_noise", 0.35)
        nui = getattr(opt, "synthetic_nuisance", 1.0)
        train = SyntheticDataset(n_cls, per, size, seed=seed, sep=sep,
                                 noise=noise, nuisance=nui)
        test = SyntheticDataset(n_cls, per, size, seed=seed + 1, sep=sep,
                                noise=noise, nuisance=nui)
        ev = SyntheticDataset(n_cls, per, size, seed=seed, sep=sep,
                              noise=noise, nuisance=nui)
    else:
        if name == "cub200":
            tr, te = _cub200_lists(source_path)
        elif name == "cars196":
            tr, te = _cars196_lists(source_path)
        elif name == "online_products":
            tr, te = _sop_lists(source_path)
        else:
            raise NotImplementedError(f"dataset {name} unknown")
        train = ImageDataset(tr, TrainTransform(aug, seed))
        test = ImageDataset(te, EvalTransform(aug))
        ev = ImageDataset(tr, EvalTransform(aug))
        ev.is_validation = True

    return {"training": train, "testing": test, "evaluation": ev}
