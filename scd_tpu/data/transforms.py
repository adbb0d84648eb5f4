"""Image transforms (PIL + numpy; no torchvision in this image).

Two families, matching the reference's behavior:

- ``get_transform("imagenet")`` — resize(size/crop_pct, bicubic) + crop +
  flip + color jitter for train, resize + center crop for eval
  (reference ``gcd/data/augmentations/__init__.py:7-33``);
- ``clip_preprocess`` — CLIP's own pipeline (resize 224 bicubic on the short
  side, center crop, CLIP mean/std), which both mains actually use for
  feature extraction (``main_unsup.py:271``: the test transform is
  overridden with ``preprocess``).

Outputs are numpy float32 HWC (NHWC batches downstream — the TPU-friendly
conv layout); normalization constants are the standard published values.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_float(img: Image.Image) -> np.ndarray:
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


def _ensure_pil(img) -> Image.Image:
    """Accept PIL images or HWC arrays (synthetic datasets yield arrays)."""
    if isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 + 1e-6 else arr,
                      0, 255).astype(np.uint8)
    return Image.fromarray(arr)


def _normalize(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    return (x - mean) / std


def _resize_short(img: Image.Image, size: int,
                  resample=Image.BICUBIC) -> Image.Image:
    w, h = img.size
    if w < h:
        nw, nh = size, max(1, round(h * size / w))
    else:
        nw, nh = max(1, round(w * size / h)), size
    return img.resize((nw, nh), resample)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def clip_preprocess(image_size: int = 224, device_normalize: bool = False):
    """CLIP's published eval preprocess.

    ``device_normalize=True`` emits uint8 HWC (resize+crop only) and defers
    the /255 + mean/std to the device (see ``device_normalize_clip``):
    4x fewer bytes over the host->device link, which dominates the feature
    extraction loop on tunneled TPUs.
    """

    def fn(img: Image.Image) -> np.ndarray:
        img = _ensure_pil(img)
        img = _resize_short(img, image_size)
        img = _center_crop(img, image_size)
        if device_normalize:
            return np.asarray(img.convert("RGB"), np.uint8)
        return _normalize(_to_float(img), CLIP_MEAN, CLIP_STD)

    return fn


def _device_normalize(x, mean, std):
    """On-device /255 + mean/std for uint8 batches; identity for float
    inputs (already normalized on host).  Called inside jitted encoders —
    the dtype branch is static at trace time."""
    import jax.numpy as jnp

    if x.dtype == jnp.uint8:
        return (x.astype(jnp.float32) / 255.0 - mean) / std
    return x


def device_normalize_clip(x):
    """CLIP stats (the mains' preprocess, ``main_unsup.py:271``)."""
    return _device_normalize(x, CLIP_MEAN, CLIP_STD)


def device_normalize_imagenet(x):
    """torchvision-ImageNet stats (the reference's dino_resnet50 / timm
    resnet50 extraction branches, ``extract_features.py:129-141,166-187``)."""
    return _device_normalize(x, IMAGENET_MEAN, IMAGENET_STD)


def device_normalize_unit(x):
    """[0, 1] scaling, NO mean/std shift — timm vit_base_patch16_224_miil
    ships default_cfg mean/std = 0/1 (``extract_features.py:143-163``)."""
    return _device_normalize(x, np.float32(0.0), np.float32(1.0))


def _rand_resized_crop(img: Image.Image, size: int, rng: np.random.Generator,
                       scale=(0.3, 1.0)) -> Image.Image:
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if cw <= w and ch <= h:
            left = rng.integers(0, w - cw + 1)
            top = rng.integers(0, h - ch + 1)
            return img.crop((left, top, left + cw, top + ch)).resize(
                (size, size), Image.BICUBIC)
    return _center_crop(_resize_short(img, size), size)


def _padded_random_crop(arr: np.ndarray, size: int, pad: int,
                        rng) -> np.ndarray:
    """torchvision RandomCrop(size, padding=pad) over a uint8 HWC array."""
    if pad:
        arr = np.pad(arr, ((pad, pad), (pad, pad), (0, 0)), mode="constant")
    top = int(rng.integers(0, max(arr.shape[0] - size, 0) + 1))
    left = int(rng.integers(0, max(arr.shape[1] - size, 0) + 1))
    return arr[top:top + size, left:left + size]


def get_transform(name: str = "imagenet", image_size: int = 224,
                  crop_pct: float = 0.875, train: bool = False,
                  seed: int = 0, rand_aug: "tuple | None" = None,
                  cutout_p: float = 1.0,
                  herbarium_lower_bound: float = 0.5):
    """Train/eval transforms, matching the reference per family
    (``gcd/data/augmentations/__init__.py:5-107``):

    - ``imagenet``: Resize(size/crop_pct) + RandomCrop + flip, ImageNet
      stats (the reference's ColorJitter() carries zero-strength defaults
      and is a no-op, :18);
    - ``cifar``: RandomCrop(pad 4) + flip, pytorch-cifar stats (:36-44);
    - ``cutout``: RandomCrop(pad 4) + flip + half-size cutout, CIFAR
      mean with the 0.2470/0.2435/0.2616 std of the cutout family
      (:66-84 — a DIFFERENT std than the pytorch-cifar family);
    - ``herbarium``: square resize + RandomResizedCrop(scale (lb, 1)) +
      flip, NO normalization (:52-64 stops at ToTensor);
    - ``rand_aug=(n, m)``: the reference's 'rand-augment' family —
      RandAugment, square resize, RandomCrop(pad 4), flip, ImageNet
      stats (:86-106).

    All randomness flows through per-thread seeded generators
    (``augment.ThreadRng``) — the loaders map these across thread pools.
    """
    if name not in ("imagenet", "cifar", "herbarium", "cutout"):
        raise ValueError(f"unknown transform family {name!r}")
    from scd_tpu.data.augment import ThreadRng

    mean, std = IMAGENET_MEAN, IMAGENET_STD
    if name == "cifar":  # pytorch-cifar stats (reference :36-38)
        mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
        std = np.array([0.2023, 0.1994, 0.2010], np.float32)
    elif name == "cutout":  # the cutout family's own stats (:77-78)
        mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
        std = np.array([0.2470, 0.2435, 0.2616], np.float32)
    thread_rng = ThreadRng(seed)

    if not train:
        def eval_fn(img) -> np.ndarray:
            img = _ensure_pil(img)
            if name in ("cifar", "cutout", "herbarium"):
                # reference eval resizes square, no crop (:47,:82,:61)
                im = img.convert("RGB").resize((image_size, image_size),
                                               Image.BICUBIC)
            else:
                im = _center_crop(
                    _resize_short(img, int(image_size / crop_pct)),
                    image_size)
            x = _to_float(im)
            if name == "herbarium":  # reference stops at ToTensor (:61-64)
                return x
            return _normalize(x, mean, std)

        return eval_fn

    if name in ("cifar", "cutout"):
        cut = None
        if name == "cutout":
            from scd_tpu.data.augment import cutout
            cut = cutout(mask_size=image_size // 2, p=cutout_p,
                         cutout_inside=False, seed=seed)

        # random crop with 4px padding + flip (reference :40-44,:71-79)
        def cifar_train_fn(img) -> np.ndarray:
            rng = thread_rng.get()
            img = _ensure_pil(img).convert("RGB")
            arr = _padded_random_crop(np.asarray(img, np.uint8),
                                      image_size, 4, rng)
            x = arr.astype(np.float32) / 255.0
            if rng.random() < 0.5:
                x = x[:, ::-1]
            x = _normalize(np.ascontiguousarray(x), mean, std)
            if cut is not None:
                x = cut(x)
            return x

        return cifar_train_fn

    if name == "herbarium":
        # square resize + RandomResizedCrop + flip, no normalize (:52-59)
        def herbarium_train_fn(img) -> np.ndarray:
            rng = thread_rng.get()
            img = _ensure_pil(img).convert("RGB").resize(
                (image_size, image_size), Image.BICUBIC)
            im = _rand_resized_crop(img, image_size, rng,
                                    scale=(herbarium_lower_bound, 1.0))
            x = _to_float(im)
            if rng.random() < 0.5:
                x = x[:, ::-1]
            return np.ascontiguousarray(x)

        return herbarium_train_fn

    randaug = None
    if rand_aug is not None:
        from scd_tpu.data.augment import RandAugment
        randaug = RandAugment(int(rand_aug[0]), int(rand_aug[1]), seed=seed)

    def train_fn(img) -> np.ndarray:
        rng = thread_rng.get()
        img = _ensure_pil(img).convert("RGB")
        if randaug is not None:
            # the reference 'rand-augment' family: RandAugment then
            # square resize + RandomCrop(pad 4) (:86-99)
            img = randaug(img)
            img = img.resize((image_size, image_size), Image.BICUBIC)
            arr = _padded_random_crop(np.asarray(img, np.uint8),
                                      image_size, 4, rng)
        else:
            # the reference 'imagenet' family: Resize(size/crop_pct) +
            # RandomCrop (no padding), no jitter (:14-23)
            img = _resize_short(img, int(image_size / crop_pct))
            arr = _padded_random_crop(np.asarray(img, np.uint8),
                                      image_size, 0, rng)
        x = arr.astype(np.float32) / 255.0
        if rng.random() < 0.5:
            x = x[:, ::-1]
        return _normalize(np.ascontiguousarray(x), mean, std)

    return train_fn
