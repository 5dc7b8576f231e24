"""Native C++ runtime tests: WAV decode and feature-store packing parity
with the Python implementations."""

import os

import numpy as np
import pytest

from autovc_tpu.runtime import FeatureStore, native_available, read_wavs

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built (no toolchain)"
)


def test_read_wavs_matches_python(reference_dir):
    from autovc_tpu.dsp import read_wav

    paths = [
        os.path.join(reference_dir, "wavs", "p225", f)
        for f in sorted(os.listdir(os.path.join(reference_dir, "wavs", "p225")))
    ]
    out, lengths, ok = read_wavs(paths, max_len=200_000)
    assert ok == len(paths)
    for i, p in enumerate(paths):
        ref, _ = read_wav(p)
        assert lengths[i] == ref.shape[0]
        np.testing.assert_array_equal(out[i, : lengths[i]], ref)


def test_feature_store_pack_matches_numpy(reference_dir, tmp_path):
    store = FeatureStore()
    spk_dir = os.path.join(reference_dir, "spmel", "p226")
    paths = [os.path.join(spk_dir, f) for f in sorted(os.listdir(spk_dir))]
    ids = store.load_npy_batch(paths)
    assert (ids >= 0).all()

    arrays = [np.load(p) for p in paths]
    for i, a in enumerate(arrays):
        assert store.rows(int(ids[i])) == a.shape[0]
        assert store.cols(int(ids[i])) == a.shape[1]

    rng = np.random.default_rng(0)
    sel = rng.integers(0, len(paths), size=4)
    offs = np.array([rng.integers(0, max(1, arrays[s].shape[0] - 64)) for s in sel])
    batch = store.pack(ids[sel], offs, len_crop=128)
    assert batch.shape == (4, 128, 80)
    for bi, (s, off) in enumerate(zip(sel, offs)):
        a = arrays[s]
        avail = min(128, a.shape[0] - off)
        np.testing.assert_array_equal(batch[bi, :avail], a[off : off + avail])
        if avail < 128:
            assert (batch[bi, avail:] == 0).all()


def test_pack_zero_pads_past_end(reference_dir):
    store = FeatureStore()
    spk_dir = os.path.join(reference_dir, "spmel", "p225")
    paths = [os.path.join(spk_dir, f) for f in sorted(os.listdir(spk_dir))[:1]]
    ids = store.load_npy_batch(paths)
    rows = store.rows(int(ids[0]))
    batch = store.pack(ids, np.array([rows - 10]), len_crop=64)
    a = np.load(paths[0])
    np.testing.assert_array_equal(batch[0, :10], a[-10:])
    assert (batch[0, 10:] == 0).all()


def test_tsan_stress_harness_clean(reference_dir, tmp_path):
    """Race detection (SURVEY §5.2): the threaded loader under
    ThreadSanitizer reports no races. Skips when TSan is unavailable."""
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    src_dir = os.path.dirname(os.path.abspath(__import__("autovc_tpu.runtime", fromlist=["x"]).__file__))
    binary = str(tmp_path / "tsan_stress")
    build = subprocess.run(
        [
            "g++", "-fsanitize=thread", "-std=c++17", "-g", "-O1", "-o", binary,
            os.path.join(src_dir, "tsan_stress.cc"),
            os.path.join(src_dir, "loader.cc"),
            "-lpthread",
        ],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[:200]}")
    npys = [
        os.path.join(reference_dir, "spmel", "p225", f)
        for f in sorted(os.listdir(os.path.join(reference_dir, "spmel", "p225")))[:4]
    ]
    run = subprocess.run([binary, *npys], capture_output=True, text=True, timeout=120)
    assert run.returncode == 0, run.stderr[-500:]
    assert "OK" in run.stdout
    assert "WARNING: ThreadSanitizer" not in run.stderr


def test_load_npy_rejects_extra_dims(tmp_path):
    """A >=3-D .npy must come back id=-1, not a silently truncated 2-D view
    of the first rows*cols floats (loader.cc shape parser reads 2 dims)."""
    p2 = tmp_path / "ok2d.npy"
    p3 = tmp_path / "bad3d.npy"
    np.save(p2, np.random.rand(7, 8).astype(np.float32))
    np.save(p3, np.random.rand(4, 5, 6).astype(np.float32))
    store = FeatureStore()
    ids = store.load_npy_batch([str(p2), str(p3)])
    assert ids[0] >= 0 and store.view(int(ids[0])).shape == (7, 8)
    assert ids[1] == -1
