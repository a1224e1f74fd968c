"""ProceduralLoader (data/pipeline.py): a learnable synthetic task with a
train/eval generalization split — the accuracy-evidence stand-in for the
reference's ImageNet logs in this no-egress environment."""

import numpy as np

from uvc_tpu.data.pipeline import ProceduralLoader


def _batches(loader):
    return list(loader)


def test_shapes_and_determinism():
    tr = ProceduralLoader(16, num_batches=3, img_size=32, num_classes=10,
                          train=True, seed=3)
    bs = _batches(tr)
    assert len(bs) == 3
    x, y = bs[0]
    assert x.shape == (16, 32, 32, 3) and x.dtype == np.uint8
    assert y.shape == (16,) and y.dtype == np.int32
    # same epoch -> identical stream
    bs2 = _batches(tr)
    np.testing.assert_array_equal(bs[1][0], bs2[1][0])
    # new epoch -> new noise AND new labels
    tr.set_epoch(1)
    bs3 = _batches(tr)
    assert not np.array_equal(bs[0][0], bs3[0][0])


def test_eval_stream_fixed_and_disjoint_from_train():
    ev = ProceduralLoader(16, num_batches=2, img_size=32, train=False,
                          seed=3)
    a = _batches(ev)
    ev.set_epoch(5)          # eval ignores epoch
    b = _batches(ev)
    np.testing.assert_array_equal(a[0][0], b[0][0])
    tr = ProceduralLoader(16, num_batches=2, img_size=32, train=True,
                          seed=3)
    t = _batches(tr)
    assert not np.array_equal(a[0][0], t[0][0])


def test_task_is_learnable_and_generalizes():
    """A closed-form least-squares probe fit on train noise must classify
    held-out eval noise well above chance — the class signal is real and
    carries across the split."""
    tr = ProceduralLoader(64, num_batches=8, img_size=16, num_classes=10,
                          train=True, seed=11)
    ev = ProceduralLoader(64, num_batches=4, img_size=16, num_classes=10,
                          train=False, seed=11)
    xs, ys = zip(*_batches(tr))
    xtr = np.concatenate(xs).reshape(len(xs) * 64, -1) / 255.0
    ytr = np.concatenate(ys)
    onehot = np.eye(10)[ytr]
    xtr = np.concatenate([xtr, np.ones((len(xtr), 1))], axis=1)
    w = np.linalg.lstsq(xtr.T @ xtr + 1e-3 * np.eye(xtr.shape[1]),
                        xtr.T @ onehot, rcond=None)[0]
    xs, ys = zip(*_batches(ev))
    xev = np.concatenate(xs).reshape(len(xs) * 64, -1) / 255.0
    xev = np.concatenate([xev, np.ones((len(xev), 1))], axis=1)
    acc = float(((xev @ w).argmax(-1) == np.concatenate(ys)).mean())
    assert acc > 0.9, f"probe accuracy {acc} — task not learnable"


def test_eval_seed_zero():
    """seed=0 eval must not derive a negative rng seed (regression)."""
    ev = ProceduralLoader(4, num_batches=1, img_size=16, train=False, seed=0)
    x, y = _batches(ev)[0]
    assert x.shape == (4, 16, 16, 3)


def test_hard_mode_knobs():
    """lowpass noise + jitter (the de-saturated e2e settings): correct
    shapes, band-limited noise, and per-image template shifts."""
    hard = ProceduralLoader(8, num_batches=1, img_size=32, num_classes=10,
                            train=True, contrast=0.35,
                            noise_mode="lowpass", jitter=8, seed=3)
    x, y = _batches(hard)[0]
    assert x.shape == (8, 32, 32, 3) and x.dtype == np.uint8
    # lowpass noise really is band-limited: spectral mass above the
    # cutoff must be tiny relative to below it
    noise = hard._lowpass_noise(np.random.default_rng(0), 4)
    spec = np.abs(np.fft.fft2(noise - noise.mean(axis=(1, 2, 3),
                                                 keepdims=True),
                              axes=(1, 2)))
    fy = (np.fft.fftfreq(32) * 32)[:, None]
    fx = (np.fft.fftfreq(32) * 32)[None, :]
    r = np.sqrt(fx * fx + fy * fy)
    hi = spec[:, r > hard.freq + 1, :].sum()
    lo = spec[:, r <= hard.freq, :].sum()
    assert hi < 0.01 * lo
    # jitter: the same class drawn twice is (almost surely) not
    # pixel-identical even at contrast 1.0
    pure = ProceduralLoader(64, num_batches=1, img_size=32, num_classes=2,
                            train=True, contrast=1.0, jitter=8, seed=3)
    xp, yp = _batches(pure)[0]
    cls0 = xp[yp == 0]
    assert len(cls0) >= 2
    assert not np.array_equal(cls0[0], cls0[1])


def test_contrast_range_spectrum():
    """Per-image contrast spectrum (the r5 de-saturation knob): images in
    one batch span the requested difficulty range, deterministically per
    (seed, epoch), and the scalar-contrast path is untouched."""
    kw = dict(num_batches=1, img_size=32, num_classes=10, train=True,
              noise_mode="lowpass", seed=5)
    spec = ProceduralLoader(64, contrast_range=(0.2, 0.6), **kw)
    x, y = _batches(spec)[0]
    assert x.shape == (64, 32, 32, 3) and x.dtype == np.uint8
    # per-image contrast variation shows up as per-image dynamic range
    # spread: correlate each image against its class template
    tpl = spec.templates[y]
    corr = []
    for i in range(64):
        a = x[i].astype(np.float32).ravel()
        b = tpl[i].ravel()
        corr.append(np.corrcoef(a, b)[0, 1])
    corr = np.asarray(corr)
    assert corr.max() - corr.min() > 0.2, \
        "contrast range produced no difficulty spread"
    # determinism
    x2, y2 = _batches(ProceduralLoader(64, contrast_range=(0.2, 0.6),
                                       **kw))[0]
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    # scalar path unchanged by the new knob's presence
    a1 = _batches(ProceduralLoader(8, contrast=0.4, **kw))[0][0]
    a2 = _batches(ProceduralLoader(8, contrast=0.4, contrast_range=None,
                                   **kw))[0][0]
    np.testing.assert_array_equal(a1, a2)


def test_hard_mode_linear_probe_degrades():
    """The de-saturation point: the pixel-space least-squares probe that
    scores >0.9 on the default task must NOT trivially solve the hard
    task (jitter breaks pixel-position matching)."""
    kw = dict(num_classes=10, img_size=16, contrast=0.35,
              noise_mode="lowpass", jitter=4, seed=11)
    tr = ProceduralLoader(64, num_batches=8, train=True, **kw)
    ev = ProceduralLoader(64, num_batches=4, train=False, **kw)
    xs, ys = zip(*_batches(tr))
    xtr = np.concatenate(xs).reshape(len(xs) * 64, -1) / 255.0
    ytr = np.concatenate(ys)
    onehot = np.eye(10)[ytr]
    xtr = np.concatenate([xtr, np.ones((len(xtr), 1))], axis=1)
    w = np.linalg.lstsq(xtr.T @ xtr + 1e-3 * np.eye(xtr.shape[1]),
                        xtr.T @ onehot, rcond=None)[0]
    xs, ys = zip(*_batches(ev))
    xev = np.concatenate(xs).reshape(len(xs) * 64, -1) / 255.0
    xev = np.concatenate([xev, np.ones((len(xev), 1))], axis=1)
    acc = float(((xev @ w).argmax(-1) == np.concatenate(ys)).mean())
    assert acc < 0.9, f"probe accuracy {acc} — hard task still trivial"
    assert acc > 0.12, f"probe accuracy {acc} — no signal at all"


def test_per_host_streams_differ():
    a = ProceduralLoader(8, num_batches=1, img_size=16, train=True,
                         seed=0, pid=0, pcount=2)
    b = ProceduralLoader(8, num_batches=1, img_size=16, train=True,
                         seed=0, pid=1, pcount=2)
    assert not np.array_equal(_batches(a)[0][0], _batches(b)[0][0])
