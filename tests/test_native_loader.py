"""Native C++ image pipeline (native/uvc_loader.cpp): decode/transform
correctness vs the PIL path, corrupt-file handling, determinism."""

import os

import numpy as np
import pytest

from uvc_tpu.data import native_loader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("jpegs")
    h, w = 137, 211
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(127 + 100 * np.sin(xx / 20) * np.cos(yy / 15)),
                    (127 + 100 * np.cos(xx / 12 + 1)),
                    (xx * 255 / w)], -1).clip(0, 255).astype(np.uint8)
    paths = []
    for i in range(4):
        p = str(d / f"img{i}.jpg")
        Image.fromarray(np.roll(img, i * 13, axis=1)).save(p, quality=92)
        paths.append(p)
    bad = str(d / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    return paths, bad


def test_eval_matches_pil(jpegs):
    from uvc_tpu.data.pipeline import load_eval_image
    paths, _ = jpegs
    out = native_loader.load_batch(paths, 96, train=False, resize_to=112)
    assert out.shape == (4, 96, 96, 3)
    ref = load_eval_image(paths[0], 96, resize_to=112)
    d = np.abs(ref.astype(int) - out[0].astype(int))
    # PIL quantizes an integer-sized intermediate; ~1 LSB drift expected
    assert d.mean() < 3.0, d.mean()


def test_train_deterministic_per_seed(jpegs):
    paths, _ = jpegs
    seeds = np.arange(4, dtype=np.uint64)
    a = native_loader.load_batch(paths, 64, train=True, seeds=seeds)
    b = native_loader.load_batch(paths, 64, train=True, seeds=seeds)
    np.testing.assert_array_equal(a, b)
    c = native_loader.load_batch(paths, 64, train=True, seeds=seeds + 10)
    assert not np.array_equal(a, c)


def test_corrupt_file_zero_filled(jpegs):
    paths, bad = jpegs
    with pytest.warns(UserWarning, match="unreadable"):
        out = native_loader.load_batch(paths + [bad], 64, train=False)
    assert out[-1].max() == 0
    assert out[0].max() > 0


def test_concurrent_load_batch_is_safe(jpegs):
    """Two producer threads (train loader + mid-epoch eval loader) share
    one native pool; overlapping parallel_for jobs must serialize, not
    corrupt each other (native/uvc_loader.cpp Pool::parallel_for)."""
    import threading

    paths, _ = jpegs
    seeds = np.arange(4, dtype=np.uint64)
    want_train = native_loader.load_batch(paths, 64, train=True,
                                          seeds=seeds)
    want_eval = native_loader.load_batch(paths, 64, train=False)

    results = {}
    errors = []

    def run(name, train):
        try:
            for _ in range(8):
                if train:
                    r = native_loader.load_batch(paths, 64, train=True,
                                                 seeds=seeds)
                else:
                    r = native_loader.load_batch(paths, 64, train=False)
            results[name] = r
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(f"t{i}", i % 2 == 0))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "deadlocked parallel_for"
    assert not errors
    np.testing.assert_array_equal(results["t0"], want_train)
    np.testing.assert_array_equal(results["t1"], want_eval)
    np.testing.assert_array_equal(results["t2"], want_train)
    np.testing.assert_array_equal(results["t3"], want_eval)


def test_bicubic_eval_matches_pil(jpegs):
    """The native bicubic filter (PIL a=-0.5 kernel, antialiased) must
    track PIL's BICUBIC resize — the DeiT recipe's default train/eval
    interpolation now runs on the C++ fast path."""
    from uvc_tpu.data.pipeline import load_eval_image
    paths, _ = jpegs
    out = native_loader.load_batch(paths, 96, train=False, resize_to=112,
                                   interpolation="bicubic")
    assert out is not None
    bil = native_loader.load_batch(paths, 96, train=False, resize_to=112,
                                   interpolation="bilinear")
    assert not np.array_equal(out, bil), "bicubic must differ from bilinear"
    for i, p in enumerate(paths):
        ref = load_eval_image(p, 96, resize_to=112,
                              interpolation="bicubic")
        d = np.abs(ref.astype(int) - out[i].astype(int))
        assert d.mean() < 3.0, d.mean()


def test_unknown_interpolation_returns_none(jpegs):
    paths, _ = jpegs
    assert native_loader.load_batch(paths, 64, train=False,
                                    interpolation="nearest") is None
