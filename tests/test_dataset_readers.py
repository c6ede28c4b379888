"""Dataset reader tests against synthetic on-disk fixtures in the exact
formats the readers parse (IDX, CIFAR pickle, class folders, COCO JSON)."""

import gzip
import json
import os
import pickle
import struct
import tempfile

import numpy as np
import pytest


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def _write_idx_images(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">III", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def _write_idx_labels(path, arr):
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.astype(np.uint8).tobytes())


def test_mnist_idx_reader(tmp):
    from vq_vae_gan_diffusion_tpu.data import MNISTDataset
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (10, 28, 28), np.uint8)
    labels = rng.integers(0, 10, (10,), np.uint8)
    raw = os.path.join(tmp, "MNIST", "raw")
    os.makedirs(raw)
    _write_idx_images(os.path.join(raw, "train-images-idx3-ubyte"), imgs)
    _write_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"), labels)
    ds = MNISTDataset(tmp, train=True)
    assert len(ds) == 10
    np.testing.assert_array_equal(ds.get_image(3)[..., 0], imgs[3])
    assert ds.get_label(3) == int(labels[3])


def test_mnist_idx_gz_reader(tmp):
    from vq_vae_gan_diffusion_tpu.data import MNISTDataset
    imgs = np.arange(2 * 28 * 28, dtype=np.uint8).reshape(2, 28, 28)
    buf = struct.pack(">HBBIII", 0, 0x08, 3, *imgs.shape) + imgs.tobytes()
    with gzip.open(os.path.join(tmp, "t10k-images-idx3-ubyte.gz"), "wb") as f:
        f.write(buf)
    ds = MNISTDataset(tmp, train=False)
    np.testing.assert_array_equal(ds.get_image(1)[..., 0], imgs[1])


def test_cifar10_pickle_reader(tmp):
    from vq_vae_gan_diffusion_tpu.data import CIFAR10Dataset
    rng = np.random.default_rng(1)
    base = os.path.join(tmp, "cifar-10-batches-py")
    os.makedirs(base)
    for i in range(1, 6):
        data = rng.integers(0, 256, (4, 3 * 32 * 32), np.uint8)
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": data, b"labels": list(range(4))}, f)
    ds = CIFAR10Dataset(tmp, train=True)
    assert len(ds) == 20
    img = ds.get_image(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_oxford_folder_reader(tmp):
    from PIL import Image

    from vq_vae_gan_diffusion_tpu.data import OxfordFlowersDataset
    for cls in ("daisy", "rose"):
        d = os.path.join(tmp, "train", cls)
        os.makedirs(d)
        for i in range(2):
            Image.fromarray(np.full((8, 8, 3), 100 + i, np.uint8)).save(
                os.path.join(d, f"img{i}.jpg"))
        # non-image files are filtered (reference extension filter)
        open(os.path.join(d, "notes.txt"), "w").write("x")
    ds = OxfordFlowersDataset(tmp, "train")
    assert len(ds) == 4
    assert ds.classes == ["daisy", "rose"]
    assert ds.get_image(0).shape == (8, 8, 3)
    assert ds.get_label(3) == 1


def test_interhand_coco_reader(tmp):
    import cv2

    from vq_vae_gan_diffusion_tpu.data import InterHand26MDataset
    img_dir = os.path.join(tmp, "images", "train")
    os.makedirs(img_dir)
    img = np.zeros((64, 64, 3), np.uint8)
    img[20:40, 20:40] = 200
    cv2.imwrite(os.path.join(img_dir, "hand.png"), img)
    ann = {
        "images": [{"id": 1, "file_name": "hand.png"}],
        "annotations": [{"image_id": 1, "bbox": [20, 20, 20, 20]}],
    }
    ann_dir = os.path.join(tmp, "annotations")
    os.makedirs(ann_dir)
    json.dump(ann, open(os.path.join(ann_dir, "train.json"), "w"))
    ds = InterHand26MDataset(tmp, "train")
    assert len(ds) == 1
    crop = ds.get_image(0)
    # bbox 20..40 with +15 margin clipped to [5, 55] → 50×50, padded square
    assert crop.shape[0] == crop.shape[1]
    assert crop.max() == 200


def test_interhand_resample_on_corrupt(tmp):
    import cv2

    from vq_vae_gan_diffusion_tpu.data import InterHand26MDataset
    img_dir = os.path.join(tmp, "images", "train")
    os.makedirs(img_dir)
    good = np.full((32, 32, 3), 50, np.uint8)
    cv2.imwrite(os.path.join(img_dir, "good.png"), good)
    ann = {
        "images": [{"id": 1, "file_name": "missing.png"},
                   {"id": 2, "file_name": "good.png"}],
        "annotations": [{"image_id": 1, "bbox": [0, 0, 10, 10]},
                        {"image_id": 2, "bbox": [0, 0, 10, 10]}],
    }
    os.makedirs(os.path.join(tmp, "annotations"))
    json.dump(ann, open(os.path.join(tmp, "annotations", "train.json"), "w"))
    ds = InterHand26MDataset(tmp, "train")
    # index 0 is corrupt → deterministic resample to index 1
    img = ds.get_image(0)
    assert img.max() == 50
