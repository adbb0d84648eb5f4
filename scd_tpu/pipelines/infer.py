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
(real use: --clip_weights ... --zeroshot_weights out.npz --names names.txt
 --images dir_or_npy)
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
            vals, idx = self._fused(self._vars, self._w,
                                    jnp.asarray(images),
                                    self.logit_scale, k=topk)
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


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()

    p = argparse.ArgumentParser(description="Name images with a discovered "
                                            "vocabulary (serving path)")
    p.add_argument("--dataset_name", type=str, default="synthetic",
                   help="synthetic runs the asset-free smoke; otherwise "
                        "provide --clip_weights/--zeroshot_weights/--names")
    p.add_argument("--clip_weights", type=str, default="")
    p.add_argument("--zeroshot_weights", type=str, default="",
                   help="npz/npy [D, K] (columns = --names order)")
    p.add_argument("--names", type=str, default="",
                   help="text file, one candidate name per line")
    p.add_argument("--images", type=str, default="",
                   help=".npy [B, H, W, C] batch to classify")
    p.add_argument("--topk", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=128)
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
    import torch

    from scd_tpu.models import CLIPModel, clip_vit_b16_config, \
        load_openai_clip_weights
    from scd_tpu.data.transforms import device_normalize_clip

    if not (args.clip_weights and args.zeroshot_weights and args.names
            and args.images):
        raise SystemExit("non-synthetic serving needs --clip_weights, "
                         "--zeroshot_weights, --names and --images")
    names = [line.rstrip("\n") for line in open(args.names)]
    zw = (np.load(args.zeroshot_weights)["weights"]
          if args.zeroshot_weights.endswith(".npz")
          else np.load(args.zeroshot_weights))

    cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16)
    sd = torch.load(args.clip_weights, map_location="cpu")
    variables = load_openai_clip_weights(
        sd.state_dict() if hasattr(sd, "state_dict") else sd, cfg)
    model = CLIPModel(cfg)

    @jax.jit
    def _enc(v, x):
        return model.apply(v, device_normalize_clip(x),
                           method=CLIPModel.encode_image)

    enc = lambda x: _enc(variables, jnp.asarray(x))  # noqa: E731
    enc.forward = lambda v, x: model.apply(
        v, device_normalize_clip(x), method=CLIPModel.encode_image)
    enc.variables = variables
    clf = NameClassifier(enc, zw, names)
    images = np.load(args.images)
    bsz = args.batch_size
    for start in range(0, len(images), bsz):
        batch = images[start:start + bsz]
        n = len(batch)
        if n < bsz:  # pad the ragged tail: a fresh shape would cost a
            # full remote recompile of the ViT program for one batch
            batch = np.concatenate(
                [batch, np.zeros((bsz - n,) + batch.shape[1:], batch.dtype)])
        named, probs = clf.classify(batch, topk=args.topk)
        for row, pr in zip(named[:n], probs[:n]):
            print(f"{row}\t{np.round(pr, 4).tolist()}")


if __name__ == "__main__":
    main()
