"""Estimate the number of clusters K.

Reference ``gcd/methods/estimate_k/estimate_k.py``: treat "ACC on the
labelled subset after clustering all features with K clusters" as a
black-box objective of K and search over
``[num_labeled_classes, max_classes]`` by halving search (:172-218) or
scipy's bounded Brent ``minimize_scalar`` (:221-242).

The objective here runs our on-device k-means (vmapped restarts) instead of
sklearn's CPU loop; each probe of K is one compiled fit.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster.kmeans import fit_kmeans
from scd_tpu.metrics import cluster_acc


def labelled_acc_objective(all_feats: np.ndarray, targets: np.ndarray,
                           mask_lab: np.ndarray,
                           n_init: int = 3, max_iterations: int = 50,
                           seed: int = 0) -> Callable[[int], float]:
    """Objective(K) = clustering ACC measured on labelled instances only
    (reference ``test_kmeans``, ``estimate_k.py:41-100``)."""
    all_feats = np.asarray(all_feats, np.float32)
    norm = np.linalg.norm(all_feats, axis=-1, keepdims=True)
    all_feats = all_feats / np.maximum(norm, 1e-12)
    mask_lab = np.asarray(mask_lab, bool)
    targets = np.asarray(targets, np.int64)

    def objective(k: int) -> float:
        cfg = ClusterConfig(n_clusters=int(k), n_init=n_init,
                            max_iterations=max_iterations)
        res = fit_kmeans(jax.random.PRNGKey(seed), all_feats, cfg)
        return float(cluster_acc(targets[mask_lab], res.labels[mask_lab]))

    return objective


def binary_search_k(objective: Callable[[int], float], min_k: int,
                    max_k: int, verbose: bool = False) -> Tuple[int, float]:
    """Halving search on the (assumed unimodal) ACC(K) curve
    (reference ``binary_search``, ``estimate_k.py:172-218``)."""
    small_k, big_k = min_k, max_k
    diff = big_k - small_k
    middle_k = int(0.5 * diff + small_k)

    acc_big = objective(big_k)
    acc_small = objective(small_k)
    acc_middle = objective(middle_k)
    best_k, best_acc = max(zip([small_k, middle_k, big_k],
                               [acc_small, acc_middle, acc_big]),
                           key=lambda kv: kv[1])
    if verbose:
        print(f"Iter 0: BigK {big_k}, Acc {acc_big:.4f} | MiddleK {middle_k}, "
              f"Acc {acc_middle:.4f} | SmallK {small_k}, Acc {acc_small:.4f}")

    for i in range(1, int(np.log2(max(diff, 2))) + 1):
        if acc_big > acc_small:
            small_k, acc_small = middle_k, acc_middle
        else:
            big_k, acc_big = middle_k, acc_middle
        diff = big_k - small_k
        middle_k = int(0.5 * diff + small_k)
        acc_middle = objective(middle_k)
        for k, a in ((middle_k, acc_middle),):
            if a > best_acc:
                best_k, best_acc = k, a
        if verbose:
            print(f"Iter {i}: BigK {big_k}, Acc {acc_big:.4f} | MiddleK "
                  f"{middle_k}, Acc {acc_middle:.4f} | SmallK {small_k}, "
                  f"Acc {acc_small:.4f}")
        if diff <= 1:
            break
    return best_k, best_acc


def scipy_optimise_k(objective: Callable[[int], float], min_k: int,
                     max_k: int) -> Tuple[int, float]:
    """Bounded Brent over K (reference ``scipy_optimise``,
    ``estimate_k.py:221-242``)."""
    from scipy.optimize import minimize_scalar

    res = minimize_scalar(lambda k: -objective(int(k)),
                          bounds=(min_k, max_k), method="bounded")
    best_k = int(round(res.x))
    return best_k, float(-res.fun)


def estimate_k(all_feats: np.ndarray, targets: np.ndarray,
               mask_lab: np.ndarray, min_k: int, max_k: int,
               method: str = "binary", verbose: bool = False,
               objective: Optional[Callable[[int], float]] = None
               ) -> Tuple[int, float]:
    obj = objective or labelled_acc_objective(all_feats, targets, mask_lab)
    if method == "binary":
        return binary_search_k(obj, min_k, max_k, verbose=verbose)
    if method == "brent":
        return scipy_optimise_k(obj, min_k, max_k)
    raise ValueError(f"unknown method {method!r}")


def dummy_objective(max_k: int = 1000, seed: int = 0) -> Callable[[int], float]:
    """Skewnorm fake ACC-vs-K curve for exercising the optimizer without
    running k-means (reference ``DUMMY_ACCS``, ``estimate_k.py:26-38``)."""
    from scipy.stats import skewnorm

    data = skewnorm.rvs(3, loc=50, scale=50, size=1000,
                        random_state=np.random.RandomState(seed)).astype(int)
    params = skewnorm.fit(data, 10, loc=80, scale=40)
    x = np.linspace(0, 255, 500)
    y = skewnorm.pdf(x, *params)
    accs = np.repeat(y, max(int(max_k / 500), 1)) * 100.0

    def obj(k: int) -> float:
        return float(accs[int(np.clip(k, 0, len(accs) - 1))])

    return obj


def main(argv=None):
    """CLI mirroring the reference's ``estimate_k.py`` __main__
    (:245-312): search K over packed features, or over the dummy curve."""
    import argparse

    from scd_tpu.utils.runtime import apply_platform_override
    apply_platform_override()

    p = argparse.ArgumentParser(description="Estimate number of clusters K")
    p.add_argument("--features", type=str, default=None,
                   help="features_packed.npz with features/targets/mask_lab "
                        "(omit for the dummy-objective self-test)")
    p.add_argument("--min_k", type=int, default=10)
    p.add_argument("--max_k", type=int, default=1000)
    p.add_argument("--search_mode", type=str, default="brent",
                   help="binary | brent")
    args = p.parse_args(argv)

    if args.features is None:
        obj = dummy_objective(max_k=args.max_k)
        if args.search_mode == "binary":
            best_k, best_acc = binary_search_k(obj, args.min_k, args.max_k,
                                               verbose=True)
        else:
            best_k, best_acc = scipy_optimise_k(obj, args.min_k, args.max_k)
    else:
        with np.load(args.features) as z:
            feats, targets = z["features"], z["targets"]
            mask_lab = z["mask_lab"].astype(bool)
        best_k, best_acc = estimate_k(feats, targets, mask_lab, args.min_k,
                                      args.max_k, method=args.search_mode,
                                      verbose=True)
    print(f"Best K: {best_k} (objective {best_acc:.4f})")
    return best_k, best_acc


if __name__ == "__main__":
    main()
