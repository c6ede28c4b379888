"""Native C++ sampledb loader vs the Python pipeline (skipped when the .so
is not built; `make -C native`)."""

import os
import tempfile

import numpy as np
import pytest

from vq_vae_gan_diffusion_tpu.data import DataLoader, Preprocessor, SyntheticDataset

native = pytest.importorskip("vq_vae_gan_diffusion_tpu.data.native_loader")
if not native.is_available():
    pytest.skip("libsampledb.so not built", allow_module_level=True)


@pytest.fixture(scope="module")
def store_path():
    ds = SyntheticDataset(64, 16, 3, seed=3)
    path = os.path.join(tempfile.mkdtemp(), "s.sdb")
    native.build_sample_store(ds, path)
    return path, ds


def test_gather_matches_python_preprocess(store_path):
    path, ds = store_path
    st = native.SampleStore(path)
    assert (st.n, st.h, st.w, st.c) == (64, 16, 16, 3)
    out = st.gather(np.array([3, 7]), mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    prep = Preprocessor(16, (0.5,) * 3, (0.5,) * 3)
    np.testing.assert_allclose(out[0], prep(ds.get_image(3)), atol=1e-6)
    np.testing.assert_allclose(out[1], prep(ds.get_image(7)), atol=1e-6)
    st.close()


def test_native_loader_epochs(store_path):
    path, _ = store_path
    dl = native.NativeDataLoader(path, batch_size=16, mean=(0.5,) * 3,
                                 std=(0.5,) * 3, seed=1)
    assert len(dl) == 4
    e1 = list(dl)
    e2 = list(dl)
    assert len(e1) == 4 and e1[0].shape == (16, 16, 16, 3)
    assert all(np.isfinite(b).all() for b in e1)
    # shuffled differently across epochs
    assert not np.array_equal(e1[0], e2[0])
    dl.close()


def test_native_flip_augmentation(store_path):
    path, ds = store_path
    st = native.SampleStore(path)
    a = st.gather(np.array([0]), p_hflip=1.0, seed=9)
    prep = Preprocessor(16, (0.5,), (0.5,))
    ref = prep(ds.get_image(0))[:, ::-1]
    np.testing.assert_allclose(a[0], ref, atol=1e-6)
    st.close()
