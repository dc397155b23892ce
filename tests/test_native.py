"""C++ ingest vs the numpy twins (which are golden vs the device ops)."""
import numpy as np
import pytest
from PIL import Image

from cmda_tpu import native
from cmda_tpu.data.dsec import host_voxel_grid, host_events_norm
from cmda_tpu.data.host_isr import host_image_change_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_grayscale_pil_exact():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
    pil = np.array(Image.fromarray(rgb).convert("L")).astype(np.float32)
    ours = native.grayscale(rgb)
    np.testing.assert_array_equal(ours, pil)


def make_events(n, seed=0, w=640, h=480):
    g = np.random.default_rng(seed)
    t = np.sort(g.random(n)).astype(np.float32)
    x = (g.random(n) * (w - 1)).astype(np.float32)
    y = (g.random(n) * (h - 1)).astype(np.float32)
    p = g.integers(0, 2, n).astype(np.float32)
    return t, x, y, p


def test_voxel_grid_matches_numpy():
    t, x, y, p = make_events(20000, w=64, h=48)
    ref = host_voxel_grid(t, x, y, p, 64, 48, 3)
    got = native.voxel_grid(t, x, y, p, bins=3, height=48, width=64)
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_events_norm_matches_numpy():
    g = np.random.default_rng(1)
    grid = g.normal(size=(1, 48, 64)).astype(np.float32)
    grid[np.abs(grid) < 0.8] = 0
    ref = host_events_norm(grid, 0.4)
    got = native.events_norm(grid, 0.4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("direction", ["rightdown", "leftup", "all"])
def test_isr_matches_numpy(direction):
    """C++ kernel vs the native-free numpy core (independent oracle —
    host_image_change itself would dispatch back to native)."""
    g = np.random.default_rng(2)
    rgb = g.integers(0, 256, (96, 128, 3)).astype(np.uint8)
    gray_pil = np.array(Image.fromarray(rgb).convert("L"), dtype=np.float32)
    ref = host_image_change_numpy(gray_pil, val_range=(0.01, 1.01),
                                  threshold=0.005, clip_range=0.1,
                                  shift_pixel=2, shift_direction=direction)
    gray = native.grayscale(rgb)
    np.testing.assert_array_equal(gray, gray_pil)
    got = native.isr(gray, val_range=(0.01, 1.01), threshold=0.005,
                     clip_range=0.1, shift_pixel=2, direction=direction)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_voxel_batch_threaded():
    t1, x1, y1, p1 = make_events(5000, seed=3, w=64, h=48)
    t2, x2, y2, p2 = make_events(3000, seed=4, w=64, h=48)
    t = np.concatenate([t1, t2]); x = np.concatenate([x1, x2])
    y = np.concatenate([y1, y2]); p = np.concatenate([p1, p2])
    offsets = np.asarray([0, 5000, 8000], np.int64)
    scale = 1.5 / 500.0
    got = native.voxel_batch(t, x, y, p, offsets, bins=1, height=48,
                             width=64, clip_scale=scale)
    ref1 = host_events_norm(host_voxel_grid(t1, x1, y1, p1, 64, 48, 1),
                            (5000 - 1) * scale)
    ref2 = host_events_norm(host_voxel_grid(t2, x2, y2, p2, 64, 48, 1),
                            (3000 - 1) * scale)
    np.testing.assert_allclose(got[0], ref1, atol=1e-3)
    np.testing.assert_allclose(got[1], ref2, atol=1e-3)


def test_native_h5_read_slice_matches_h5py(tmp_path):
    """C++ chunk decode (inflate [+unshuffle]) == h5py slicing on a
    DSEC-style gzip events dataset."""
    h5py = pytest.importorskip("h5py")
    from cmda_tpu.data.native_h5 import read_slice
    rng = np.random.default_rng(0)
    path = tmp_path / "ev.h5"
    n = 100_000
    with h5py.File(path, "w") as f:
        f.create_dataset("t", data=rng.integers(0, 1 << 40, n, dtype=np.int64),
                         chunks=(4096,), compression="gzip", shuffle=True)
        f.create_dataset("x", data=rng.integers(0, 640, n, dtype=np.uint16),
                         chunks=(8192,), compression="gzip")
    with h5py.File(path, "r") as f:
        for start, stop in ((0, 10), (4000, 9000), (95_000, 100_000),
                            (99_990, 100_000), (0, n)):
            np.testing.assert_array_equal(
                read_slice(f["t"], start, stop), f["t"][start:stop])
            np.testing.assert_array_equal(
                read_slice(f["x"], start, stop), f["x"][start:stop])


def test_native_png_decode_matches_pil(tmp_path):
    from cmda_tpu import native
    if not native.png_available():
        pytest.skip("libpng not linked")
    from PIL import Image
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    data = p.read_bytes()
    np.testing.assert_array_equal(native.png_decode(data), arr)
    # grayscale frame round-trip (single-channel PNG)
    g = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    pg = tmp_path / "g.png"
    Image.fromarray(g, mode="L").save(pg)
    np.testing.assert_array_equal(native.png_decode(pg.read_bytes(),
                                                    gray=True), g)


def test_open_rgb_uses_native_and_matches_pil(tmp_path):
    from cmda_tpu.data.host_isr import open_rgb
    from PIL import Image
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    got = np.asarray(open_rgb(str(p)))
    np.testing.assert_array_equal(got, arr)
