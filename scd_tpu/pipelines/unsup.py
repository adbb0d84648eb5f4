"""Unsupervised SCD pipeline — the ``main_unsup.py`` equivalent.

Stages (reference call stack, SURVEY §3.1): encoders -> cached feature
extraction (clustering features + CLIP features) -> clustering (KM / SSKM /
ConSSKM / FINCH) -> ACC v2 -> vocabulary + zero-shot weights -> fused
per-image top-k names -> iterative voting loop with per-iteration
ACC/sACC/Soft-sACC printouts -> name-set IoU.

Run: ``python -m scd_tpu.pipelines.unsup --dataset_name synthetic
--cluster SSKM`` (synthetic needs no assets; real datasets take
``--root_dir`` plus weight paths in the config overrides).
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import numpy as np

from scd_tpu.core.config import (
    ClusterConfig,
    DataConfig,
    FeatureConfig,
    NamingConfig,
    PipelineConfig,
)
from scd_tpu.data import get_class_splits, get_datasets
from scd_tpu.metrics import name_set_iou, split_cluster_acc_v2
from scd_tpu.naming.classnames import remap_cidx_to_cname, \
    resolve_class_names
from scd_tpu.naming.loop import voting_loop
from scd_tpu.naming.templates import IMAGENET_TEMPLATES
from scd_tpu.naming.vote import topk_names
from scd_tpu.pipelines.common import (
    cluster_cache_key,
    load_shared_features,
    load_zeroshot_weights,
    pipeline_transform,
    print_acc_block,
    run_clustering,
    stage_cache,
)


def vit_feature_backbones() -> Dict:
    """feat_model -> (ViT config factory, device-normalization fn) for the
    ViT extraction backbones.  One loader serves every checkpoint
    (DINO/GCD/PASS/timm all use the blocks.N.* layout; wrappers are
    unwrapped by ``load_dino_weights``).  Normalization follows what each
    reference branch actually feeds its model: dino_vit/gcd use the mains'
    CLIP-preprocess convention (``main_unsup.py:271``); dino_vit_s (the
    PASS branch) and dino_vit_t use torchvision ImageNet stats
    (``extract_features.py:109-127`` builds ``get_transform('imagenet')``);
    vit_supervised's timm-miil default_cfg is mean/std 0/1
    (``extract_features.py:143-163``)."""
    from scd_tpu.data.transforms import (
        device_normalize_clip,
        device_normalize_imagenet,
        device_normalize_unit,
    )
    from scd_tpu.models import (
        dino_vit_b16_config,
        dino_vit_s16_config,
        dino_vit_t16_config,
    )

    return {
        "dino_vit": (dino_vit_b16_config, device_normalize_clip),
        "gcd": (dino_vit_b16_config, device_normalize_clip),
        "vit_supervised": (dino_vit_b16_config, device_normalize_unit),
        "dino_vit_s": (dino_vit_s16_config, device_normalize_imagenet),
        "dino_vit_t": (dino_vit_t16_config, device_normalize_imagenet),
    }


def build_encoders(cfg: PipelineConfig, extras: Dict, mesh=None):
    """Returns (feat_encode_image, clip_encode_image, encode_text).

    With ``mesh``, the image encoders are data-parallel over the mesh
    (``make_sharded_image_encoder``): the batch axis shards over chips with
    replicated parameters — the multi-chip path for the pipeline's dominant
    stage (reference hot loop #1, ``main_unsup.py:114-147``)."""
    name = cfg.feature.feat_model
    if cfg.data.dataset_name == "synthetic" or name == "synthetic":
        from scd_tpu.models.synthetic import SyntheticCLIP
        from scd_tpu.pipelines.common import make_sharded_image_encoder

        clip = SyntheticCLIP(extras["class_colors"])
        img_encode = clip.encode_image
        if mesh is not None:
            img_encode = make_sharded_image_encoder(
                lambda vv, x: clip._encode_with(vv[0], vv[1], x),
                (clip.w1, clip.w2), mesh)
        return img_encode, img_encode, clip.encode_text

    import jax.numpy as jnp

    from scd_tpu.models import (
        CLIPModel,
        CLIPTokenizer,
        VisionTransformer,
        clip_vit_b16_config,
        load_dino_weights,
        load_openai_clip_weights,
    )

    if not cfg.data.clip_weights:
        raise FileNotFoundError(
            "cfg.data.clip_weights must point to an OpenAI CLIP ViT-B/16 "
            "checkpoint for non-synthetic datasets")
    import torch

    clip_cfg = clip_vit_b16_config(compute_dtype=jnp.bfloat16,
                                   dense_int8=cfg.feature.dense_int8)
    clip_sd = torch.load(cfg.data.clip_weights, map_location="cpu")
    clip_vars = load_openai_clip_weights(
        clip_sd.state_dict() if hasattr(clip_sd, "state_dict") else clip_sd,
        clip_cfg)
    clip_model = CLIPModel(clip_cfg)
    tokenizer = CLIPTokenizer(cfg.data.corpus_dir + "/bpe_simple_vocab_16e6.txt.gz")

    import jax

    # Weights are jit ARGUMENTS, not closure captures — captured arrays are
    # baked into the HLO as constants, which explodes compile time on the
    # remote-compile TPU path for 100M+ param models.
    from scd_tpu.data.transforms import device_normalize_clip
    from scd_tpu.pipelines.common import make_sharded_image_encoder

    def _clip_img_fwd(v, x):
        # uint8 batches are normalized here on device (4x less H2D traffic)
        return clip_model.apply(v, device_normalize_clip(x),
                                method=CLIPModel.encode_image)

    @jax.jit
    def _clip_txt(v, toks):
        return clip_model.apply(v, toks, method=CLIPModel.encode_text)

    if mesh is not None:
        clip_encode_image = make_sharded_image_encoder(
            _clip_img_fwd, clip_vars, mesh)
    else:
        _clip_img = jax.jit(_clip_img_fwd)

        def clip_encode_image(images: np.ndarray) -> np.ndarray:
            return np.asarray(_clip_img(clip_vars, jnp.asarray(images)))

    def encode_text(texts) -> np.ndarray:
        from scd_tpu.naming.zeroshot import truncate_to_eot_bucket

        # EOT-bucket truncation is exact (causal tower, EOT pooling) and
        # cuts the text FLOPs ~2.4x for typical vocabulary prompts
        toks = truncate_to_eot_bucket(np.asarray(tokenizer(texts), np.int32))
        return np.asarray(_clip_txt(clip_vars, jnp.asarray(toks)))

    # expose the raw pieces so build_zeroshot_weights can shard the names
    # axis over a mesh (the ~68k-vocabulary build is the pipeline's longest
    # cold-start stage and embarrassingly parallel)
    encode_text.forward = lambda v, toks: clip_model.apply(
        v, toks, method=CLIPModel.encode_text)
    encode_text.variables = clip_vars
    encode_text.tokenize = tokenizer
    if not cfg.feature.dense_int8:
        # prefix-KV-cache hooks for the opt-in SCD_PREFIX_VOCAB=1 build
        # (naming/zeroshot.py — measured a TIE with the default full-row
        # builder; see build_zeroshot_weights_prefix).  The int8 knob
        # skips them — its tile-aligned seq padding doesn't compose with
        # 8-token suffixes.
        encode_text.prefix_forward = lambda v, toks: clip_model.apply(
            v, toks, method=CLIPModel.encode_text_prefix)
        encode_text.suffix_forward = lambda v, toks, kv, p_len: \
            clip_model.apply(v, toks, kv, p_len,
                             method=CLIPModel.encode_text_suffix)

    vit_feat_cfgs = vit_feature_backbones()
    if name == "clip":
        feat_encode = clip_encode_image
    elif name in vit_feat_cfgs:
        path = (f"{cfg.data.gcd_weights_dir}/"
                f"{cfg.data.dataset_name}_model_best.pt"
                if name == "gcd" else cfg.data.dino_weights)
        cfg_fn, normalize = vit_feat_cfgs[name]
        vit_cfg = cfg_fn(compute_dtype=jnp.bfloat16,
                         dense_int8=cfg.feature.dense_int8,
                         gelu_tanh=cfg.feature.gelu_tanh)
        sd = torch.load(path, map_location="cpu")
        dino_vars = load_dino_weights(sd, vit_cfg)
        dino = VisionTransformer(vit_cfg)

        def _dino_fwd(v, x):
            return dino.apply(v, normalize(x))

        if mesh is not None:
            feat_encode = make_sharded_image_encoder(_dino_fwd, dino_vars,
                                                     mesh)
        else:
            _dino = jax.jit(_dino_fwd)

            def feat_encode(images: np.ndarray) -> np.ndarray:
                return np.asarray(_dino(dino_vars, jnp.asarray(images)))
    elif name == "resnet50":
        from scd_tpu.data.transforms import device_normalize_imagenet
        from scd_tpu.models import (
            ResNet50,
            ResNet50Config,
            load_resnet50_weights,
        )

        r50_cfg = ResNet50Config(compute_dtype=jnp.bfloat16)
        sd = torch.load(cfg.data.dino_weights, map_location="cpu")
        r50_vars = load_resnet50_weights(sd, r50_cfg)
        r50 = ResNet50(r50_cfg)

        def _r50_fwd(v, x):
            return r50.apply(v, device_normalize_imagenet(x))

        if mesh is not None:
            feat_encode = make_sharded_image_encoder(_r50_fwd, r50_vars,
                                                     mesh)
        else:
            _r50 = jax.jit(_r50_fwd)

            def feat_encode(images: np.ndarray) -> np.ndarray:
                return np.asarray(_r50(r50_vars, jnp.asarray(images)))
    else:
        raise ValueError(f"unknown feat_model {name!r}")

    return feat_encode, clip_encode_image, encode_text


def load_vocabulary(cfg: PipelineConfig, extras: Dict):
    """Returns (nouns, taxonomy_or_None).  Corpus names follow the reference
    (wordnet | wikibird | wikidog, ``clip_lang_util.py:139-149``); synthetic
    builds a class-names+distractors list."""
    corpus = cfg.naming.corpus
    if cfg.data.dataset_name == "synthetic" or corpus == "synthetic":
        from scd_tpu.models.synthetic import synthetic_vocabulary

        return synthetic_vocabulary(extras["class_names"]), None

    import os

    taxonomy = None
    if corpus == "wordnet":
        from scd_tpu.naming.wordnet import Taxonomy

        if cfg.data.wordnet_db_dir:
            taxonomy = Taxonomy.from_wndb(cfg.data.wordnet_db_dir)
        else:
            taxonomy = Taxonomy.from_nltk()
        path = os.path.join(cfg.data.corpus_dir, "wordnet_all_noun.txt")
        if os.path.exists(path):
            nouns = [line.rstrip("\n") for line in open(path)]
        else:
            nouns = taxonomy.all_names()
    elif corpus in ("wikibird", "wikidog"):
        fname = ("wiki_birdclass_names.txt" if corpus == "wikibird"
                 else "wiki_dogclass_names.txt")
        nouns = [line.rstrip("\n")
                 for line in open(os.path.join(cfg.data.corpus_dir, fname))]
        nouns = [n.lower().replace("'s", "").replace(" ", "_") for n in nouns]
    else:
        nouns = [line.rstrip("\n") for line in open(corpus)]
    nouns = [n.lower().replace("-", "_") for n in nouns]
    return nouns, taxonomy


def run_unsup(cfg: PipelineConfig) -> Dict:
    from scd_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cache = stage_cache(cfg)
    train_classes, unlabeled_classes = get_class_splits(cfg.data)
    tf = pipeline_transform(cfg)
    train_merged, test_ds, unlab_ds, extras = get_datasets(cfg.data, train_transform=tf, test_transform=tf)

    from scd_tpu.pipelines.common import _pipeline_mesh

    mesh = _pipeline_mesh(cfg)
    # encoders build lazily: a fully-cached re-entry (features + zeroshot
    # imported or from a prior run — the reference's own cache protocol,
    # main_unsup.py:294-311, 387-395) never constructs a model or loads
    # weights, so it runs asset-free (the reference still pays
    # clip.load + torch.hub on every re-entry)
    from scd_tpu.pipelines.common import lazy_encoders

    feat_encode, clip_encode, encode_text = lazy_encoders(
        lambda: build_encoders(cfg, extras, mesh=mesh))

    # One dataset pass feeds BOTH encoders (the reference iterates twice,
    # main_unsup.py:297-311 — decode/transform/H2D paid twice); each
    # feature set still caches under its own key, and only the keys whose
    # cache lookups will miss get their tower run.
    feats, clip_feats = load_shared_features(
        cfg, cache, feat_encode, clip_encode, train_merged, train_classes)

    cluster_result = cache.load_or_compute(
        "cluster", cluster_cache_key(cfg),
        lambda: run_clustering(cfg, feats),
        refresh=cfg.run_cluster)

    u_preds = cluster_result["u_preds"].astype(np.int64)
    u_targets = cluster_result["u_targets"].astype(np.int64)
    mask = cluster_result["mask"].astype(bool)
    all_acc, old_acc, new_acc = split_cluster_acc_v2(u_targets, u_preds, mask)
    print(f"{cfg.cluster.algorithm} Accuracies: All {all_acc} | Old {old_acc} "
          f"| New {new_acc}")

    nouns, taxonomy = load_vocabulary(cfg, extras)

    zw = load_zeroshot_weights(cfg, cache, encode_text, nouns, mesh=mesh)

    cidx_to_cname = remap_cidx_to_cname(
        resolve_class_names(
            cfg.data.dataset_name, extras, nouns, zw, encode_text,
            IMAGENET_TEMPLATES,
            wnid_to_name=taxonomy.wnid_to_name if taxonomy else None,
            corpus=cfg.naming.corpus),
        train_classes, unlabeled_classes)

    clip_all = clip_feats["all_feats"]
    mask_lab = clip_feats["mask_lab"].astype(bool)
    # only the unlabelled rows vote — top-k over all rows wastes ~25% of
    # the [N, 68k] fused stage on labelled rows that are sliced away
    clip_u_feats = clip_all[~mask_lab]
    name_idx_u, _vals = topk_names(clip_u_feats, zw, cfg.naming.topk,
                                   scale=cfg.naming.logit_scale)

    name_sim = taxonomy.name_similarity if taxonomy else None
    if name_sim is None and cfg.data.dataset_name == "synthetic":
        from scd_tpu.models.synthetic import synthetic_name_similarity

        name_sim = synthetic_name_similarity
    eval_soft = cfg.eval_soft_sacc and cfg.data.dataset_name != "cub"

    def metrics_cb(it: int, preds: np.ndarray, cand_names) -> Dict:
        print(f"iter: {it}")
        out = print_acc_block("vote", u_targets, preds, mask, cidx_to_cname,
                              cand_names, name_similarity=name_sim,
                              eval_soft=eval_soft)
        # the per-iteration voted-name list is the loop's actual state —
        # history carries it for diagnostics and the composed-oracle test
        out["cand_names"] = list(cand_names)
        return out

    result = voting_loop(nouns, name_idx_u, clip_u_feats, zw, u_preds,
                         cfg.cluster.n_clusters, cfg.naming,
                         metrics_cb=metrics_cb)

    if cfg.naming.textual_enhancement:
        from scd_tpu.naming.loop import voting_loop_te

        print("-- textual enhancement round --")
        result = voting_loop_te(nouns, name_idx_u, clip_u_feats, zw, result,
                                cfg.cluster.n_clusters, cfg.naming,
                                alpha=cfg.naming.te_alpha,
                                metrics_cb=metrics_cb)

    gt_names = list(cidx_to_cname.values())
    iou = name_set_iou(result.cand_names, gt_names)
    print(f"IoU: {iou}")

    return {"cluster_acc": (all_acc, old_acc, new_acc),
            "voting": result, "iou": iou,
            "history": result.history,
            "cidx_to_cname": cidx_to_cname}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Unsupervised SCD pipeline (TPU)")
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--root_dir", type=str, default="/data")
    p.add_argument("--dataset_name", type=str, default="synthetic")
    p.add_argument("--feat_model", type=str, default="synthetic",
                   help="synthetic | clip | dino_vit | dino_vit_s | "
                        "dino_vit_t | vit_supervised | resnet50 | gcd")
    p.add_argument("--prop_train_labels", type=float, default=0.5)
    p.add_argument("--cluster", type=str, default="SSKM",
                   help="KM | SSKM | ConSSKM | FINCH")
    p.add_argument("--n_cluster", type=int, default=10)
    p.add_argument("--cluster_size_min", type=int, default=0)
    p.add_argument("--cluster_size_max", type=int, default=10 ** 9)
    p.add_argument("--corpus", type=str, default="synthetic")
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--num_common_vote", type=int, default=20)
    p.add_argument("--num_common_linear", type=int, default=4)
    p.add_argument("--te", action="store_true",
                   help="textual-enhancement re-ranking round (w/TE)")
    p.add_argument("--te_alpha", type=float, default=0.5)
    p.add_argument("--extract_feat", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 int8 dense path for the ViT extraction "
                        "towers.  Measured 8-24%% SLOWER than bf16 on v5e "
                        "at ViT-B/16 scale (pad + fusion-barrier costs "
                        "outweigh per-GEMM kernel wins; see README) — "
                        "parity-pinned knob for hardware where that flips")
    # --no-run_cluster re-enters from the cached clustering artifact (a
    # store_true with default=True could never be switched off, silently
    # re-running SSKM/ConSSKM every invocation)
    p.add_argument("--run_cluster", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--cache_dir", type=str, default="artifacts")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-axis size (0 = all visible devices / model)")
    p.add_argument("--mesh_model", type=int, default=1)
    return p


def config_from_args(args, partially_supervised: bool = False) -> PipelineConfig:
    from scd_tpu.core.config import MeshConfig

    return PipelineConfig(
        mesh=MeshConfig(data=getattr(args, "mesh_data", 0),
                        model=getattr(args, "mesh_model", 1)),
        data=DataConfig(dataset_name=args.dataset_name, root_dir=args.root_dir,
                        prop_train_labels=args.prop_train_labels,
                        batch_size=args.batch_size,
                        num_workers=args.num_workers,
                        cache_dir=args.cache_dir),
        feature=FeatureConfig(feat_model=args.feat_model,
                              dense_int8=getattr(args, 'int8', False)),
        cluster=ClusterConfig(algorithm=args.cluster,
                              n_clusters=args.n_cluster,
                              size_min=args.cluster_size_min,
                              size_max=args.cluster_size_max),
        naming=NamingConfig(corpus=args.corpus, topk=args.topk,
                            num_common_vote=args.num_common_vote,
                            num_common_linear=args.num_common_linear,
                            textual_enhancement=args.te,
                            te_alpha=args.te_alpha),
        partially_supervised=partially_supervised,
        extract_feat=args.extract_feat,
        run_cluster=args.run_cluster,
    )


def main(argv=None):
    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()
    args = build_argparser().parse_args(argv)
    return run_unsup(config_from_args(args))


if __name__ == "__main__":
    main()
