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


def test_native_loader_max_samples(store_path):
    """max_samples must truncate the epoch (ADVICE r1: the native fast path
    silently ignored subset limits, changing epoch size vs the Python loader)."""
    path, ds = store_path
    dl = native.NativeDataLoader(path, batch_size=8, mean=(0.5,) * 3,
                                 std=(0.5,) * 3, seed=1, max_samples=24)
    assert dl.n == 24 and len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    # only the first 24 store samples may appear: compare against the full
    # set of limit-window samples materialized via gather
    st = native.SampleStore(path)
    allowed = st.gather(np.arange(24), mean=(0.5,) * 3, std=(0.5,) * 3)
    got = np.concatenate(batches)
    for sample in got:
        assert any(np.allclose(sample, a, atol=1e-6) for a in allowed)
    st.close()
    dl.close()


def test_truncated_store_rejected(tmp_path):
    """A store whose file is shorter than header+n*h*w*c must fail to open
    (ADVICE r1: out-of-bounds reads past the mapping)."""
    import struct
    p = tmp_path / "trunc.sdb"
    # header claims 64 samples of 16x16x3 but carries only 10 bytes of data
    with open(p, "wb") as f:
        f.write(struct.pack("<5Q", native._MAGIC, 64, 16, 16, 3))
        f.write(b"\x00" * 10)
    with pytest.raises(OSError):
        native.SampleStore(str(p))
    # shorter than the header itself
    p2 = tmp_path / "tiny.sdb"
    p2.write_bytes(b"\x01\x02")
    with pytest.raises(OSError):
        native.SampleStore(str(p2))


def test_abandoned_epoch_not_served_stale(store_path):
    """Abandoning an iterator mid-epoch then restarting must not serve a
    stale previous-epoch batch (ADVICE r1 epoch-reset race)."""
    path, _ = store_path
    dl = native.NativeDataLoader(path, batch_size=4, mean=(0.5,) * 3,
                                 std=(0.5,) * 3, seed=5, shuffle=False)
    for trial in range(10):
        it = iter(dl)
        next(it)  # abandon mid-epoch with workers still producing
        fresh = next(iter(dl))
        # shuffle=False → first batch of every epoch is samples [0..4)
        st = native.SampleStore(path)
        expect = st.gather(np.arange(4), mean=(0.5,) * 3, std=(0.5,) * 3)
        st.close()
        np.testing.assert_allclose(fresh, expect, atol=1e-6)
    dl.close()


def test_native_flip_augmentation(store_path):
    path, ds = store_path
    st = native.SampleStore(path)
    a = st.gather(np.array([0]), p_hflip=1.0, seed=9)
    prep = Preprocessor(16, (0.5,), (0.5,))
    ref = prep(ds.get_image(0))[:, ::-1]
    np.testing.assert_allclose(a[0], ref, atol=1e-6)
    st.close()
