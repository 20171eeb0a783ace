"""Native C++ preprocessing pipeline: build, correctness vs numpy oracle,
concurrency, throughput sanity."""

import numpy as np
import pytest

from ku.native import NativeImagePipeline

pytestmark = pytest.mark.skipif(
    not NativeImagePipeline.available(), reason="no C++ toolchain"
)


def _bilinear_oracle(img, oh, ow):
    """Half-pixel-centered bilinear resize (matches the kernel's math)."""
    ih, iw, c = img.shape
    out = np.zeros((oh, ow, c), np.float32)
    for y in range(oh):
        sy = max((y + 0.5) * ih / oh - 0.5, 0.0)
        y0 = int(sy)
        y1 = min(y0 + 1, ih - 1)
        fy = sy - y0
        for x in range(ow):
            sx = max((x + 0.5) * iw / ow - 0.5, 0.0)
            x0 = int(sx)
            x1 = min(x0 + 1, iw - 1)
            fx = sx - x0
            top = img[y0, x0] + (img[y0, x1] - img[y0, x0]) * fx
            bot = img[y1, x0] + (img[y1, x1] - img[y1, x0]) * fx
            out[y, x] = top + (bot - top) * fy
    return out


def test_native_resize_matches_oracle(rng):
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    pipe = NativeImagePipeline(out_h=32, out_w=32, n_threads=1)
    pipe.submit(img)
    out = pipe.get()
    pipe.close()
    assert out.shape == (32, 32, 3)
    # Aspect preserved: 53→32 wide ⇒ height ≈ 37*32/53 = 22, letterboxed.
    scale = min(32 / 37, 32 / 53)
    rh, rw = int(37 * scale), int(53 * scale)
    pad_t, pad_l = (32 - rh) // 2, (32 - rw) // 2
    oracle = _bilinear_oracle(img.astype(np.float32), rh, rw)
    oracle = oracle * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(
        out[pad_t:pad_t + rh, pad_l:pad_l + rw], oracle, rtol=1e-4, atol=1e-4
    )
    # Letterbox rows are zero.
    assert np.abs(out[:pad_t]).max() == 0.0


def test_native_pipeline_concurrent(rng):
    pipe = NativeImagePipeline(out_h=16, out_w=16, n_threads=4, capacity=32)
    imgs = [rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
            for _ in range(20)]
    for img in imgs:
        pipe.submit(img)
    batch = pipe.get_batch(20)
    assert batch.shape == (20, 16, 16, 3)
    assert pipe.pending() == 0
    assert np.isfinite(batch).all()
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    pipe.close()


def test_native_faster_than_python(rng):
    """4-thread native pipeline should beat the single-threaded numpy
    oracle comfortably on a real workload."""
    import time

    imgs = [rng.integers(0, 256, size=(256, 256, 3)).astype(np.uint8)
            for _ in range(32)]

    pipe = NativeImagePipeline(out_h=128, out_w=128, n_threads=4, capacity=64)
    start = time.perf_counter()
    for img in imgs:
        pipe.submit(img)
    _ = pipe.get_batch(len(imgs))
    native_t = time.perf_counter() - start
    pipe.close()

    start = time.perf_counter()
    for img in imgs[:4]:
        _bilinear_oracle(img.astype(np.float32), 128, 128)
    python_t = (time.perf_counter() - start) * len(imgs) / 4
    assert native_t < python_t, (native_t, python_t)


def test_results_arrive_in_submit_order(rng):
    """Submit N distinguishable images of varying sizes on 4 threads —
    larger images take longer, so completion order differs from submit
    order. Delivery must still be submit order (image/label pairing
    depends on it — the FFHQ sequence pairs popped images with
    submit-order labels)."""
    n = 48
    pipe = NativeImagePipeline(out_h=8, out_w=8, n_threads=4, capacity=64)
    # Constant-valued square images: value i identifies submit index i.
    # Alternate tiny/large sizes so worker completion order scrambles.
    sizes = [8 if i % 2 == 0 else 300 for i in range(n)]
    for i in range(n):
        img = np.full((sizes[i], sizes[i], 3), i, np.uint8)
        pipe.submit(img)
    for i in range(n):
        out = pipe.get()
        # Constant image → every output pixel equals the submit index
        # (after the [-1,1] normalization).
        val = out[4, 4, 0] if np.isfinite(out[4, 4, 0]) else out[0, 0, 0]
        recovered = int(round((val + 1.0) * 255.0 / 2.0))
        assert recovered == i, (i, recovered)
    pipe.close()


def test_ffhq_sequence_label_pairing(rng, tmp_path):
    """End-to-end: the StyleGAN FFHQ sequence pairs native-loaded images
    with submit-order labels; with constant-valued files, each popped
    image must carry the pixel value of its own file index."""
    import sys, os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "style_based_gan"))
    try:
        from style_based_gan import TrainingSequenceFFHQ
    finally:
        sys.path.pop(0)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    n_files = 12
    for i in range(n_files):
        img = np.full((32 + 16 * (i % 3), 32, 3), i * 20, np.uint8)
        mpimg.imsave(tmp_path / f"{i:05d}.png", img)
    seq = TrainingSequenceFFHQ(
        str(tmp_path),
        hps={"batch_size": 8},
        nn_arch={"resolution": 16, "label_usage": True},
        map_nn_arch={"latent_dim": 4, "num_classes": n_files},
        batch_shuffle=True, seed=3,
    )
    if getattr(seq, "_native", None) is None:
        pytest.skip("sequence fell back to the Python path")
    for _ in range(4):
        batch = next(seq)
        labels = batch["label"].reshape(-1).astype(int)
        # Center pixel of each image recovers the file index it came from.
        vals = ((batch["x"][:, 8, 8, 0] + 1.0) * 255.0 / 2.0 / 20.0)
        recovered = np.round(vals).astype(int)
        np.testing.assert_array_equal(recovered % n_files, labels % n_files)


def test_overpop_raises_instead_of_deadlocking(rng):
    pipe = NativeImagePipeline(out_h=8, out_w=8, n_threads=2)
    pipe.submit(rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8))
    _ = pipe.get()
    with pytest.raises(RuntimeError):
        pipe.get()  # nothing pending — must raise, not hang
    pipe.close()


def test_submit_file_decodes_png(rng, tmp_path):
    """In-worker libpng decode (submit_file) == Python-decoded submit()
    for the same PNG, and delivery order pairs with submit order."""
    pipe = NativeImagePipeline(out_h=16, out_w=16, n_threads=2)
    if not pipe.supports_files():
        pipe.close()
        pytest.skip("loader built without libpng")
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    paths, raws = [], []
    for i in range(6):
        img = rng.integers(0, 256, size=(24 + 4 * i, 20, 3)).astype(np.uint8)
        p = tmp_path / f"img_{i}.png"
        mpimg.imsave(p, img)
        paths.append(str(p))
        raws.append(img)
    for p in paths:
        pipe.submit_file(p)
    got_files = pipe.get_batch(len(paths))
    assert pipe.errors() == 0
    for raw in raws:
        pipe.submit(raw)
    got_mem = pipe.get_batch(len(raws))
    np.testing.assert_allclose(got_files, got_mem, rtol=1e-5, atol=1e-5)
    pipe.close()


def test_submit_file_decode_error_counted(tmp_path):
    """A corrupt file yields a zeroed output in the right slot (delivery
    order holds) and increments errors() instead of wedging the ring."""
    pipe = NativeImagePipeline(out_h=8, out_w=8, n_threads=2)
    if not pipe.supports_files():
        pipe.close()
        pytest.skip("loader built without libpng")
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    good = np.full((10, 10, 3), 200, np.uint8)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.image as mpimg
    good_p = tmp_path / "good.png"
    mpimg.imsave(good_p, good)

    pipe.submit_file(str(bad))
    pipe.submit_file(str(good_p))
    out_bad = pipe.get()
    out_good = pipe.get()
    assert pipe.errors() == 1
    assert np.abs(out_bad).max() == 0.0
    assert np.abs(out_good).max() > 0.1
    pipe.close()
