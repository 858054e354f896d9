"""Data layer tests: dataset contract, samplers, loader, transforms."""

import types

import numpy as np
import pytest
from PIL import Image

import vit_reranking_tpu.data as data
from vit_reranking_tpu.data.samplers import select as sampler_select
from vit_reranking_tpu.data.transforms import (
    EvalTransform,
    TrainTransform,
    denormalize,
    input_transform,
    normalize,
)


def opt(**kw):
    base = dict(
        dataset="synthetic", bs=8, samples_per_class=2, seed=0, kernels=2,
        source_path="/tmp/none", augmentation="base", synthetic_classes=4,
        synthetic_per_class=8, synthetic_size=32,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_synthetic_dataset_contract():
    splits = data.select("synthetic", opt())
    tr = splits["training"]
    assert len(tr) == 32
    assert sorted(tr.image_dict) == [0, 1, 2, 3]
    label, img, idx = tr[5]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert tr.image_list[5][1] == label
    # deterministic reload
    _, img2, _ = tr[5]
    np.testing.assert_array_equal(img, img2)


def test_class_random_sampler_spc():
    splits = data.select("synthetic", opt())
    tr = splits["training"]
    s = sampler_select("class_random", opt(), tr.image_dict, tr.image_list)
    batches = list(s)
    assert len(batches) == len(tr) // 8
    for b in batches:
        assert len(b) == 8
        labels = [tr.image_list[i][1] for i in b]
        # SPC-2: every label appears an even number of times >= 2
        for l in set(labels):
            assert labels.count(l) % 2 == 0


def test_random_sampler_has_positive_pair():
    splits = data.select("synthetic", opt())
    tr = splits["training"]
    s = sampler_select("random", opt(), tr.image_dict, tr.image_list)
    for b in s:
        labels = [tr.image_list[i][1] for i in b]
        assert any(labels.count(l) > 1 for l in set(labels))
        break


def test_greedy_coreset_sampler_storage_flow():
    splits = data.select("synthetic", opt())
    tr = splits["training"]
    s = sampler_select("greedy_coreset", opt(), tr.image_dict, tr.image_list)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((len(tr), 16)).astype(np.float32)
    s.create_storage(emb)
    s.precompute_indices()
    batches = list(s)
    assert len(batches) == len(s)
    assert all(len(b) == 8 for b in batches)
    s.replace_storage_entries(np.zeros((2, 16), np.float32), [0, 1])
    assert np.all(s.storage[0] == 0)


def test_loader_batches_and_build_dataset():
    o = opt()
    loaders, sampler = data.build_dataset(o)
    assert o.n_classes == 4
    labels, images, idxs = next(iter(loaders["training"]))
    assert images.shape == (8, 32, 32, 3)
    assert labels.shape == (8,) and idxs.shape == (8,)
    n = 0
    for labels, images, idxs in loaders["testing"]:
        n += len(labels)
    assert n == 32


def test_transforms_roundtrip():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    out = TrainTransform("base", seed=0)(img)
    assert out.shape == (224, 224, 3)
    out = TrainTransform("adv", seed=0)(img)
    assert out.shape == (224, 224, 3)
    out = TrainTransform("big", seed=0)(img)
    assert out.shape == (256, 256, 3)
    out = TrainTransform("red", seed=0)(img)
    assert out.shape == (224, 224, 3)
    ev = EvalTransform("base")(img)
    assert ev.shape == (224, 224, 3)
    # normalize/denormalize inverse
    back = denormalize(normalize(arr))
    assert np.abs(back.astype(int) - arr.astype(int)).max() <= 1
    ms = input_transform((48, 64))(img)
    assert ms.shape == (48, 64, 3)
