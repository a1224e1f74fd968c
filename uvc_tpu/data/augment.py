"""DeiT training-recipe augmentation.

The reference baseline suite trains with timm ``create_transform``:
RandAugment ``rand-m9-mstd0.5-inc1``, color jitter 0.4, random erasing
``reprob=0.25 remode=pixel recount=1``
(/root/reference/UVC/Baseline_pruning/datasets.py:134-141, main.py flag
defaults :60-78).  This module provides first-party equivalents:

* ``RandAugment`` — the 15-op increasing-transform policy on PIL images,
  applied host-side per image inside the loader's worker pool (after
  RandomResizedCrop + flip, the timm transform order);
* ``color_jitter_image`` — brightness/contrast/saturation jitter, used only
  when RandAugment is off (timm disables jitter when an auto-augment policy
  is set: transforms_factory.py semantics);
* ``random_erasing`` — a *device-side* jax implementation of timm
  RandomErasing(mode='pixel'): erases a random rectangle of the normalized
  image with unit gaussian noise.  Batched and fused into the train step —
  the TPU-native placement for a purely elementwise op.

All magnitude mappings follow timm's ``_RAND_INCREASING_TRANSFORMS`` with
``_LEVEL_DENOM = 10``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_LEVEL_DENOM = 10.0
_FILL = (124, 116, 104)  # timm default img_mean fill


def _enhance(img, kind: str, factor: float):
    from PIL import ImageEnhance
    return {
        "color": ImageEnhance.Color,
        "contrast": ImageEnhance.Contrast,
        "brightness": ImageEnhance.Brightness,
        "sharpness": ImageEnhance.Sharpness,
    }[kind](img).enhance(factor)


def _resample(interpolation: str):
    # timm passes the recipe's train interpolation into the aa params
    # (DeiT: bicubic); PIL codes: 2 = BILINEAR, 3 = BICUBIC
    return 3 if interpolation == "bicubic" else 2


def _shear(img, ax: str, v: float, resample: int):
    from PIL import Image
    mat = (1, v, 0, 0, 1, 0) if ax == "x" else (1, 0, 0, v, 1, 0)
    return img.transform(img.size, Image.AFFINE, mat,
                         resample=resample, fillcolor=_FILL)


def _translate(img, ax: str, frac: float, resample: int):
    from PIL import Image
    px = frac * (img.size[0] if ax == "x" else img.size[1])
    mat = (1, 0, px, 0, 1, 0) if ax == "x" else (1, 0, 0, 0, 1, px)
    return img.transform(img.size, Image.AFFINE, mat,
                         resample=resample, fillcolor=_FILL)


def _neg(rng, v):
    return -v if rng.random() < 0.5 else v


def _apply_op(img, name: str, level: float, rng: np.random.Generator,
              resample: int = 2):
    """One RandAugment op at the given (already noise-jittered) level.
    Increasing-transform argument mappings: timm auto_augment.py
    ``_RAND_INCREASING_TRANSFORMS`` + ``*_increasing_level_to_arg``."""
    from PIL import ImageOps
    frac = level / _LEVEL_DENOM
    if name == "AutoContrast":
        return ImageOps.autocontrast(img)
    if name == "Equalize":
        return ImageOps.equalize(img)
    if name == "Invert":
        return ImageOps.invert(img)
    if name == "Rotate":
        return img.rotate(_neg(rng, frac * 30.0), resample=resample,
                          fillcolor=_FILL)
    if name == "Posterize":
        bits = 4 - int(frac * 4)
        return ImageOps.posterize(img, bits) if bits < 8 else img
    if name == "Solarize":
        return ImageOps.solarize(img, int(256 - frac * 256))
    if name == "SolarizeAdd":
        add = int(frac * 110)
        arr = np.asarray(img).astype(np.int32)
        lut = arr + np.where(arr < 128, add, 0)
        from PIL import Image
        return Image.fromarray(np.clip(lut, 0, 255).astype(np.uint8))
    if name in ("Color", "Contrast", "Brightness", "Sharpness"):
        return _enhance(img, name.lower(), 1.0 + _neg(rng, frac * 0.9))
    if name == "ShearX":
        return _shear(img, "x", _neg(rng, frac * 0.3), resample)
    if name == "ShearY":
        return _shear(img, "y", _neg(rng, frac * 0.3), resample)
    if name == "TranslateX":
        return _translate(img, "x", _neg(rng, frac * 0.45), resample)
    if name == "TranslateY":
        return _translate(img, "y", _neg(rng, frac * 0.45), resample)
    raise ValueError(name)


_RAND_OPS = ("AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
             "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
             "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY")


class RandAugment:
    """``rand-mM-mstdS-incl`` policy: ``num_ops`` ops drawn uniformly, each
    applied with prob ``prob`` at magnitude ~ N(magnitude, mstd) clipped to
    [0, 10]."""

    def __init__(self, magnitude: float = 9.0, mstd: float = 0.5,
                 num_ops: int = 2, prob: float = 0.5,
                 interpolation: str = "bilinear"):
        self.magnitude = magnitude
        self.mstd = mstd
        self.num_ops = num_ops
        self.prob = prob
        self.resample = _resample(interpolation)

    @classmethod
    def from_string(cls, spec: str,
                    interpolation: str = "bilinear") -> "RandAugment":
        """Parse a timm auto-augment string, e.g. ``rand-m9-mstd0.5-inc1``
        (the ``inc`` flag is implicit: this implementation always uses the
        increasing transforms, timm's recommended set)."""
        if not spec.startswith("rand"):
            raise ValueError(f"unsupported auto-augment policy: {spec}")
        kw = dict(magnitude=9.0, mstd=0.5, num_ops=2, prob=0.5,
                  interpolation=interpolation)
        for part in spec.split("-")[1:]:
            if part.startswith("mstd"):
                kw["mstd"] = float(part[4:])
            elif part.startswith("m"):
                kw["magnitude"] = float(part[1:])
            elif part.startswith("n"):
                kw["num_ops"] = int(part[1:])
            elif part.startswith("p"):
                kw["prob"] = float(part[1:])
            elif part.startswith("inc"):
                pass  # increasing transforms are always used
            elif part.startswith("w"):
                pass  # weighted op choice: timm stub, never implemented
        return cls(**kw)

    def __call__(self, img, rng: np.random.Generator):
        for _ in range(self.num_ops):
            if rng.random() > self.prob:
                continue
            name = _RAND_OPS[rng.integers(len(_RAND_OPS))]
            level = self.magnitude
            if self.mstd > 0:
                level = rng.normal(self.magnitude, self.mstd)
            level = float(np.clip(level, 0.0, _LEVEL_DENOM))
            img = _apply_op(img, name, level, rng, self.resample)
        return img


def color_jitter_image(img, rng: np.random.Generator, strength: float = 0.4):
    """Brightness/contrast/saturation jitter with uniform factors in
    [1-s, 1+s], random order (torchvision ColorJitter semantics used by
    timm when no aa policy is given)."""
    kinds = ["brightness", "contrast", "color"]
    rng.shuffle(kinds)
    for kind in kinds:
        img = _enhance(img, kind, rng.uniform(1 - strength, 1 + strength))
    return img


def make_train_augment(aa: Optional[str] = None,
                       color_jitter: float = 0.0,
                       interpolation: str = "bilinear"):
    """Returns ``fn(uint8_hwc_array, np_rng) -> uint8_hwc_array`` or None.

    timm precedence: an auto-augment policy disables color jitter
    (Baseline_pruning passes both; timm create_transform keeps only aa).
    """
    ra = RandAugment.from_string(aa, interpolation) \
        if aa and aa != "none" else None
    if ra is None and color_jitter <= 0:
        return None

    def fn(arr: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        from PIL import Image
        img = Image.fromarray(arr)
        img = ra(img, rng) if ra is not None \
            else color_jitter_image(img, rng, color_jitter)
        return np.asarray(img, np.uint8)

    return fn


def random_erasing(key, x, prob: float = 0.25, count: int = 1,
                   scale=(0.02, 1 / 3), ratio=(0.3, 10 / 3),
                   mode: str = "pixel"):
    """Device-side timm RandomErasing: per image, with probability
    ``prob``, overwrite a random rectangle of the *normalized*
    [B, H, W, C] batch.  Fill by ``mode`` (timm random_erasing.py
    _get_pixels): 'pixel' = per-pixel unit gaussian, 'rand' = one
    gaussian draw per channel per image, 'const' = zeros.

    Static shapes: the rectangle is expressed as a boolean mask built from
    broadcasted index comparisons (no dynamic slicing), so the op fuses
    into the surrounding step under jit.
    """
    import jax
    import jax.numpy as jnp

    b, h, w, c = x.shape
    keys = jax.random.split(key, 5)
    area = h * w

    def one(k):
        ka, kr, ky, kx, kp, kn = jax.random.split(k, 6)
        target = area * jax.random.uniform(ka, (b,), minval=scale[0],
                                           maxval=scale[1])
        log_r = jax.random.uniform(
            kr, (b,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
        ar = jnp.exp(log_r)
        eh = jnp.clip(jnp.round(jnp.sqrt(target * ar)), 1, h)
        ew = jnp.clip(jnp.round(jnp.sqrt(target / ar)), 1, w)
        y0 = jnp.floor(jax.random.uniform(ky, (b,)) * (h - eh + 1))
        x0 = jnp.floor(jax.random.uniform(kx, (b,)) * (w - ew + 1))
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(w)[None, None, :]
        inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
                  & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
        do = jax.random.uniform(kp, (b,)) < prob
        mask = (inside & do[:, None, None])[..., None]          # [B,H,W,1]
        if mode == "rand":
            noise = jnp.broadcast_to(
                jax.random.normal(kn, (b, 1, 1, c), jnp.float32),
                x.shape).astype(x.dtype)
        elif mode == "const":
            noise = jnp.zeros_like(x)
        else:                                   # 'pixel' (recipe default)
            noise = jax.random.normal(kn, x.shape,
                                      jnp.float32).astype(x.dtype)
        return jnp.where(mask, noise, x)

    for i in range(count):
        x = one(jax.random.fold_in(keys[0], i))
    return x
