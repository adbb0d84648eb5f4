"""Production-scale smoke: drive every hot pipeline stage at ImageNet-100
shapes on one chip, no assets needed.

Fabricates class-structured features and a 68k-column vocabulary whose
ground-truth name columns embed the class signatures, then runs the real
pipeline stages end-to-end (the synthetic CI dataset is tiny; this is the
true-shape viability check — HBM footprints, streaming top-k, voting-loop
convergence, bound evaluators):

1. SSKM clustering of ~98k unlabelled + ~33k labelled 768-d features
   (reference hot loop #2, ``main_unsup.py:334-364``);
2. ConSSKM with the on-device sinkhorn E-step at the same scale;
3. fused vocabulary top-k over [N, 512] x [512, 68000] (hot loop #3);
4. the iterative voting loop to fixpoint (hot loop #4);
5. the ptsup zero-shot bound evaluators (full + GT-restricted vocabulary).

Run on the TPU: ``python scripts/scale_smoke.py``; CI uses ``--small``.
Each stage prints wall-clock.  In this environment the figures are
dominated by one-time costs rather than compute: every stage pays a
remote XLA compile on a cold cache (the persistent cache partially works
— CLAUDE.md rule 6: the SSKM program's cold start drops 112s -> 42s when
a previous process populated it; this script enables it) and the SSKM
stage includes the one-time ~400 MB host->device feature upload at
~50 MB/s.  Steady-state per-iteration rates are what ``bench.py``
measures; this script's job is true-shape viability:
measured on v5e (round 3): SSKM 9.2s steady-state in-process (the
fused Pallas E+M kernel; a fresh process adds a remote-compile residual
with HUGE variance — 90-590s observed for the same program across runs,
CLAUDE.md rule 6), ConSSKM 34s incl. compile (the sinkhorn E-step's
feasibility early-exit repair makes the steady-state step ~1 ms),
vocabulary top-k 8s, voting loop 6.6s (4 iterations to fixpoint; one
bucket-padded compile + one feature upload for all rounds), zero-shot
bounds 12.8s — all stages complete within HBM at full scale.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# runnable as `python scripts/scale_smoke.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Stage:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        print(f"[scale_smoke] {self.name}: "
              f"{time.perf_counter() - self.t0:.2f}s", flush=True)


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CI shapes (CPU-runnable in seconds)")
    args = ap.parse_args(argv)

    from scd_tpu.utils.runtime import (apply_platform_override,
                                       enable_compilation_cache)

    apply_platform_override()
    enable_compilation_cache()

    import jax

    from scd_tpu.cluster import fit_constrained, fit_sskm
    from scd_tpu.core.config import ClusterConfig, NamingConfig
    from scd_tpu.metrics import split_cluster_acc_v2
    from scd_tpu.naming.loop import voting_loop
    from scd_tpu.naming.vote import topk_names
    from scd_tpu.pipelines.ptsup import _top1_acc, zero_shot_preds

    if args.small:
        n_u, n_l, d_feat, d_clip, v, k = 3000, 800, 64, 32, 3000, 10
        size_min, size_max = 30, 2000
        max_iter, n_init = 10, 2
    else:
        n_u, n_l, d_feat, d_clip, v, k = 98304, 32768, 768, 512, 68000, 100
        size_min, size_max = 50, 1200
        max_iter, n_init = 20, 3

    rng = np.random.default_rng(0)
    print(f"[scale_smoke] shapes: N_u={n_u} N_l={n_l} D={d_feat}/{d_clip} "
          f"V={v} K={k} on {jax.default_backend()}", flush=True)

    # class-structured features: cluster c's members sit around a center
    feat_centers = rng.standard_normal((k, d_feat)).astype(np.float32) * 3
    clip_centers = rng.standard_normal((k, d_clip)).astype(np.float32)
    clip_centers /= np.linalg.norm(clip_centers, axis=1, keepdims=True)
    u_true = rng.integers(0, k, n_u)
    l_true = rng.integers(0, k // 2, n_l)  # labelled classes: first half
    u_feats = (feat_centers[u_true]
               + 0.5 * rng.standard_normal((n_u, d_feat)).astype(np.float32))
    l_feats = (feat_centers[l_true]
               + 0.5 * rng.standard_normal((n_l, d_feat)).astype(np.float32))
    clip_u = (clip_centers[u_true]
              + 0.1 * rng.standard_normal((n_u, d_clip)).astype(np.float32))
    clip_u /= np.linalg.norm(clip_u, axis=1, keepdims=True)

    # vocabulary: GT name columns embed the clip class signatures
    nouns = [f"name_{i}" for i in range(v)]
    zw = rng.standard_normal((d_clip, v)).astype(np.float32)
    zw /= np.linalg.norm(zw, axis=0, keepdims=True)
    stride = v // k
    gt_cols = np.arange(k) * stride
    zw[:, gt_cols] = clip_centers.T
    cidx_to_cname = {c: nouns[gt_cols[c]] for c in range(k)}

    results: dict = {}

    with _Stage(f"SSKM fit (n_init={n_init}, max_iter={max_iter}; incl. "
                "feature upload)"):
        cfg = ClusterConfig(algorithm="SSKM", n_clusters=k, n_init=n_init,
                            max_iterations=max_iter)
        res = fit_sskm(jax.random.PRNGKey(0), u_feats, l_feats, l_true, cfg)
    u_preds0 = res.labels[n_l:]
    mask_old = u_true < k // 2
    accs = split_cluster_acc_v2(u_true, u_preds0, mask_old)
    results["sskm_acc"] = accs
    print(f"[scale_smoke]   SSKM ACC all/old/new: "
          f"{accs[0]:.3f}/{accs[1]:.3f}/{accs[2]:.3f}", flush=True)

    with _Stage("ConSSKM fit (sinkhorn E-step on device)"):
        ccfg = ClusterConfig(algorithm="ConSSKM", n_clusters=k,
                             n_init=max(n_init - 1, 1), max_iterations=10,
                             size_min=size_min, size_max=size_max,
                             constrained_backend="sinkhorn")
        cres = fit_constrained(jax.random.PRNGKey(1), u_feats, l_feats,
                               l_true, ccfg)
    sizes = np.bincount(cres.labels[n_l:], minlength=k)
    assert sizes.min() >= size_min and sizes.max() <= size_max, \
        f"size constraints violated: [{sizes.min()}, {sizes.max()}]"
    results["consskm_sizes"] = (int(sizes.min()), int(sizes.max()))
    print(f"[scale_smoke]   ConSSKM sizes in [{sizes.min()}, {sizes.max()}]",
          flush=True)

    with _Stage(f"vocabulary top-k ([{n_u}, {d_clip}] x [{d_clip}, {v}])"):
        name_idx, _vals = topk_names(clip_u, zw, k=5)
    results["topk_hit"] = float((name_idx[:, 0] == gt_cols[u_true]).mean())
    print(f"[scale_smoke]   top-1 name hit rate: {results['topk_hit']:.3f}",
          flush=True)

    with _Stage("voting loop to fixpoint"):
        ncfg = NamingConfig(topk=5, num_common_vote=20, num_common_linear=4)
        vres = voting_loop(nouns, name_idx, clip_u, zw, u_preds0, k, ncfg)
    gt_names = [cidx_to_cname[int(t)] for t in u_true]
    named_acc = float(np.mean([
        vres.cand_names[p] == g
        for p, g in zip(vres.u_preds, gt_names)
        if p < len(vres.cand_names)]))
    results["voting_iters"] = vres.n_iters
    results["voting_sacc"] = named_acc
    print(f"[scale_smoke]   voting: {vres.n_iters} iters, "
          f"{len(vres.cand_names)} names, sACC~{named_acc:.3f}", flush=True)

    with _Stage("zero-shot bounds (full + GT-restricted vocabulary)"):
        lb_preds = zero_shot_preds(clip_u, zw)
        lb = _top1_acc(lb_preds, u_true, cidx_to_cname, nouns)
        zw_gt = zw[:, gt_cols]
        ub_preds = zero_shot_preds(clip_u, zw_gt)
        ub = _top1_acc(ub_preds, u_true, cidx_to_cname,
                       [cidx_to_cname[c] for c in range(k)])
    results["lb"], results["ub"] = lb, ub
    print(f"[scale_smoke]   sACC LB {lb:.1f} / UB {ub:.1f}", flush=True)

    print(f"[scale_smoke] done: {results}", flush=True)
    return results


if __name__ == "__main__":
    main()
