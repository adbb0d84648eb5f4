"""Serving entry point: name images with a discovered vocabulary.

The discovery pipelines (``unsup``/``ptsup``) END at a candidate name set
+ per-image assignments; the reference offers no way to apply that result
to NEW images (its closest path is re-running the zero-shot block,
``main_unsup.py:601-614``).  This module closes the deployment loop: load
the CLIP image tower + the zero-shot weight columns of a (candidate) name
list once, then classify arbitrary image batches to names — the
production serving path of the discovered classifier.

Design: one jitted program per batch shape (encode -> normalize ->
[B, D] x [D, K] -> argmax/top-k), weights as jit arguments (repo-wide
invariant), uint8 input normalized on device (4x less H2D).  With a mesh
the batch axis dp-shards exactly like extraction
(``make_sharded_image_encoder``).

Run (asset-free smoke):
  python -m scd_tpu.pipelines.infer --dataset_name synthetic --topk 3
Real use — names every image in a directory (flat or imagefolder layout),
batch 128, dp-sharded over all visible chips:
  python -m scd_tpu.pipelines.infer --dataset_name real \
    --clip_weights ViT-B-16.pt --zeroshot_weights zw.npz \
    --names names.txt --images /path/to/images --batch_size 128
(--clip_weights random = randomly-initialized tower for smoke/load tests;
 --mesh_data 1 disables the mesh path)
"""

from __future__ import annotations

import argparse
from typing import Callable, List, Optional, Sequence

import numpy as np


class NameClassifier:
    """Image -> name classifier over a fixed candidate-name weight matrix.

    ``encode_image(images) -> [B, D]`` is any image encoder (the pipeline
    CLIP closure, a sharded mesh encoder, or the synthetic stand-in);
    ``weights`` [D, K] are the L2-normalized zero-shot columns of
    ``names`` (built by ``build_zeroshot_weights`` or sliced from a full
    vocabulary).
    """

    def __init__(self, encode_image: Callable, weights: np.ndarray,
                 names: Sequence[str], logit_scale: float = 100.0):
        from functools import partial

        import jax
        import jax.numpy as jnp

        if weights.shape[1] != len(names):
            raise ValueError(
                f"weights [D, K={weights.shape[1]}] vs {len(names)} names")
        self.encode_image = encode_image
        self.names = list(names)
        self.logit_scale = float(logit_scale)
        # device-resident weights stay put (CLAUDE.md rule 3: np.asarray on
        # a jax Array would round-trip them through the host)
        self._w = (weights.astype(jnp.float32)
                   if isinstance(weights, jax.Array)
                   else jnp.asarray(np.asarray(weights, np.float32)))
        # mesh encoders (make_sharded_image_encoder) expose .mesh/.stage:
        # replicate the weight columns over the mesh and row-shard each
        # batch so the fused encode+classify program runs dp over chips
        self._stage = getattr(encode_image, "stage", None)
        mesh = getattr(encode_image, "mesh", None)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._w = jax.device_put(self._w, NamedSharding(mesh, P()))

        def _head(w, feats, scale, k):
            f = feats.astype(jnp.float32)
            f = f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
            probs = jax.nn.softmax(scale * (f @ w), axis=-1)
            return jax.lax.top_k(probs, k)  # (vals, idx)

        # Pipeline encoders (build_encoders, make_sharded_image_encoder)
        # expose .forward/.variables: fuse encode+classify into ONE jitted
        # program — no feature fetch/re-upload and a single dispatch per
        # batch (each tunnel dispatch carries a ~33 ms round trip).
        fwd = getattr(encode_image, "forward", None)
        self._vars = getattr(encode_image, "variables", None)
        if fwd is not None and self._vars is not None:
            @partial(jax.jit, static_argnames=("k",))
            def _fused(v, w, images, scale, k):
                return _head(w, fwd(v, images), scale, k)

            self._fused = _fused
        else:
            self._fused = None

        self._cls = partial(jax.jit, static_argnames=("k",))(_head)

    def classify(self, images: np.ndarray, topk: int = 1):
        """[B, H, W, C] images -> (names [B][topk], probs [B, topk])."""
        import jax.numpy as jnp

        topk = min(int(topk), len(self.names))
        if self._fused is not None:
            n = len(images)
            if self._stage is not None:  # mesh: pad + row-shard the batch
                images, n = self._stage(images)
            else:
                images = jnp.asarray(images)
            vals, idx = self._fused(self._vars, self._w, images,
                                    self.logit_scale, k=topk)
            vals, idx = vals[:n], idx[:n]
        else:
            # generic encoder: accept whatever it returns (device arrays
            # pass through without a host round trip)
            feats = jnp.asarray(self.encode_image(images))
            vals, idx = self._cls(self._w, feats, self.logit_scale, k=topk)
        idx, vals = np.asarray(idx), np.asarray(vals)
        return [[self.names[j] for j in row] for row in idx], vals


def classifier_from_run(encode_image: Callable, zeroshot_weights: np.ndarray,
                        nouns: Sequence[str], cand_names: Sequence[str],
                        logit_scale: float = 100.0) -> NameClassifier:
    """Build a serving classifier from a finished voting-loop run: slice
    the candidate names' columns out of the full-vocabulary weights (the
    exact re-classification matrix the loop converged with,
    ``naming/loop.py::_reclassify``)."""
    col = {n: i for i, n in enumerate(nouns)}
    missing = [n for n in cand_names if n not in col]
    if missing:
        raise KeyError(f"candidate names not in vocabulary: {missing[:5]}")
    from scd_tpu.naming.loop import gather_weight_columns

    # residency-aware slice: device arrays gather on device (never fetch
    # the whole [D, V]); host numpy slices on host (never upload it)
    w = gather_weight_columns(zeroshot_weights,
                              [col[n] for n in cand_names])
    return NameClassifier(encode_image, w, cand_names,
                          logit_scale=logit_scale)


def build_clip_encoder(variables, cfg, mesh=None) -> Callable:
    """The serving image encoder: CLIP tower + on-device uint8 normalize,
    exposing the ``.forward``/``.variables`` contract NameClassifier fuses
    with.  With ``mesh``, the batch axis dp-shards over the mesh's data
    axis exactly like pipeline extraction
    (``make_sharded_image_encoder``)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.data.transforms import device_normalize_clip
    from scd_tpu.models import CLIPModel

    model = CLIPModel(cfg)

    def forward(v, x):
        return model.apply(v, device_normalize_clip(x),
                           method=CLIPModel.encode_image)

    if mesh is not None:
        from scd_tpu.pipelines.common import make_sharded_image_encoder

        return make_sharded_image_encoder(forward, variables, mesh)

    jitted = jax.jit(forward)
    enc = lambda x: jitted(variables, jnp.asarray(x))  # noqa: E731
    enc.forward = forward
    enc.variables = variables
    return enc


def _pad_tail(batch: np.ndarray, batch_size: int) -> np.ndarray:
    """Zero-pad a ragged tail batch up to ``batch_size`` rows
    (``core.mesh.pad_rows`` with the batch size as the multiple —
    tails are always <= one batch)."""
    from scd_tpu.core.mesh import pad_rows

    return pad_rows(np.asarray(batch), batch_size)[0]


def iter_image_batches(path: str, batch_size: int, image_size: int = 224,
                       num_workers: int = 8):
    """Yield fixed-shape ``(images [batch_size, H, W, C], n_valid)`` pairs
    from ``--images``:

    - a ``.npy``/``.npz`` file: a pre-staged [B, H, W, C] array (npz: the
      ``images`` key, or the archive's single array);
    - a directory: the UNION of flat image files and imagefolder-layout
      subfolders (``<dir>/<class>/<image>``, the reference's
      serving-adjacent scan, ``main_unsup.py:423-426``) — decoded by the
      threaded loader (``data/loader.py``) with CLIP eval preprocess,
      uint8 until the on-device normalize.

    Ragged tails are zero-padded to ``batch_size`` (a fresh shape would
    recompile the whole ViT program for one batch); ``n_valid`` marks the
    real rows."""
    import os

    if os.path.isdir(path):
        from scd_tpu.data.core import ImageTable
        from scd_tpu.data.datasets import (IMG_EXTENSIONS, _pil_loader,
                                           scan_imagefolder)
        from scd_tpu.data.loader import iterate_batches
        from scd_tpu.data.transforms import clip_preprocess

        # serve the UNION of flat files and <class>/ subfolder contents:
        # a mostly-flat directory with one stray subdir (.thumbnails,
        # __MACOSX) must not silently drop the flat images, and vice versa
        sub_paths, sub_targets, _classes = scan_imagefolder(path)
        flat = sorted(f for f in os.listdir(path)
                      if f.lower().endswith(IMG_EXTENSIONS)
                      and os.path.isfile(os.path.join(path, f)))
        paths = np.concatenate([
            np.array([os.path.join(path, f) for f in flat], object),
            np.asarray(sub_paths, object)])
        targets = np.concatenate([np.full(len(flat), -1, np.int64),
                                  np.asarray(sub_targets, np.int64)])
        if len(paths) == 0:
            raise SystemExit(f"no images found under {path}")
        table = ImageTable(
            source=paths, targets=targets,
            uq_idxs=np.arange(len(paths), dtype=np.int64),
            classnames=[], load=_pil_loader,
            transform=clip_preprocess(image_size, device_normalize=True))
        for images, _labels, _uqs, _mask in iterate_batches(
                table, batch_size, num_workers=num_workers):
            yield _pad_tail(images, batch_size), len(images)
        return

    if path.endswith(".npz"):
        z = np.load(path)
        # accept the documented 'images' key or any single-array archive
        # (np.savez(f, batch) stores under arr_0)
        key = "images" if "images" in z.files else z.files[0]
        images = z[key]
    else:
        images = np.load(path)
    for start in range(0, len(images), batch_size):
        batch = images[start:start + batch_size]
        yield _pad_tail(batch, batch_size), len(batch)


def _load_clip_variables(clip_weights: str, cfg):
    """OpenAI checkpoint, or ``random`` = a randomly-initialized tower
    (smoke / load-test mode: full serving path, meaningless names)."""
    import jax
    import jax.numpy as jnp

    from scd_tpu.models import CLIPModel, load_openai_clip_weights

    if clip_weights == "random":
        import sys

        print("[infer] --clip_weights random: randomly-initialized CLIP "
              "(names are meaningless; smoke/load-test mode)",
              file=sys.stderr)
        model = CLIPModel(cfg)
        s = cfg.vision.image_size
        return jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, cfg.context_length), jnp.int32))
    import torch

    sd = torch.load(clip_weights, map_location="cpu")
    return load_openai_clip_weights(
        sd.state_dict() if hasattr(sd, "state_dict") else sd, cfg)


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()

    p = argparse.ArgumentParser(description="Name images with a discovered "
                                            "vocabulary (serving path)")
    p.add_argument("--dataset_name", type=str, default="synthetic",
                   help="synthetic runs the asset-free smoke; otherwise "
                        "provide --clip_weights/--zeroshot_weights/--names")
    p.add_argument("--clip_weights", type=str, default="",
                   help="OpenAI CLIP checkpoint (.pt), or 'random' for a "
                        "randomly-initialized tower (smoke/load-test)")
    p.add_argument("--zeroshot_weights", type=str, default="",
                   help="npz/npy [D, K] (columns = --names order)")
    p.add_argument("--names", type=str, default="",
                   help="text file, one candidate name per line")
    p.add_argument("--images", type=str, default="",
                   help=".npy/.npz [B, H, W, C] batch, a directory of "
                        "image files, or an imagefolder "
                        "(<dir>/<class>/<image>)")
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--image_size", type=int, default=0,
                   help="loader resize; 0 = the CLIP tower's native size. "
                        "A conflicting value is rejected up front (the "
                        "ViT pos-embed grid is size-specific).")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-axis size (0 = all visible devices; 1 "
                        "disables the mesh path)")
    args = p.parse_args(argv)

    if args.dataset_name == "synthetic":
        from scd_tpu.core.config import DataConfig
        from scd_tpu.data import get_datasets
        from scd_tpu.models.synthetic import SyntheticCLIP
        from scd_tpu.naming.zeroshot import build_zeroshot_weights

        dcfg = DataConfig(dataset_name="synthetic")
        _m, test_ds, _u, extras = get_datasets(dcfg)
        clip = SyntheticCLIP(extras["class_colors"])
        names = sorted(extras["class_colors"])
        w = build_zeroshot_weights(clip.encode_text, names, ["{}"])
        clf = NameClassifier(clip.encode_image, w, names)
        imgs = np.stack([np.asarray(test_ds[i][0]) for i in range(16)])
        truth = [names[int(test_ds[i][1])] for i in range(16)]
        named, probs = clf.classify(imgs, topk=args.topk)
        acc = np.mean([t in row for t, row in zip(truth, named)])
        for row, pr in list(zip(named, probs))[:4]:
            print(f"pred: {row} p={np.round(pr, 3).tolist()}")
        print(f"top-{args.topk} accuracy on 16 synthetic test images: {acc}")
        return acc

    # real-asset path
    from scd_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from scd_tpu.models import clip_vit_b16_config

    if not (args.clip_weights and args.zeroshot_weights and args.names
            and args.images):
        raise SystemExit("non-synthetic serving needs --clip_weights, "
                         "--zeroshot_weights, --names and --images")
    names = [line.rstrip("\n") for line in open(args.names)]
    zw = (np.load(args.zeroshot_weights)["weights"]
          if args.zeroshot_weights.endswith(".npz")
          else np.load(args.zeroshot_weights))

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    image_size = args.image_size or cfg.vision.image_size
    if image_size != cfg.vision.image_size:
        raise SystemExit(
            f"--image_size {image_size} conflicts with the CLIP tower's "
            f"native {cfg.vision.image_size} (the ViT pos-embed grid is "
            "size-specific); omit the flag or pass the native size")
    variables = _load_clip_variables(args.clip_weights, cfg)

    mesh = None
    if args.mesh_data != 1 and len(jax.devices()) > 1:
        from scd_tpu.core.config import MeshConfig
        from scd_tpu.core.mesh import make_mesh

        mesh = make_mesh(MeshConfig(data=args.mesh_data, model=1))
    enc = build_clip_encoder(variables, cfg, mesh=mesh)
    clf = NameClassifier(enc, zw, names)

    count = 0
    for batch, n in iter_image_batches(args.images, args.batch_size,
                                       image_size=image_size,
                                       num_workers=args.num_workers):
        named, probs = clf.classify(batch, topk=args.topk)
        for row, pr in zip(named[:n], np.asarray(probs)[:n]):
            print(f"{row}\t{np.round(pr, 4).tolist()}")
        count += n
    return count


if __name__ == "__main__":
    main()
