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

import functools
from typing import Callable, Optional, Tuple

import jax
import numpy as np

from scd_tpu.core.config import ClusterConfig
from scd_tpu.cluster.kmeans import fit_kmeans
from scd_tpu.metrics import cluster_acc


def _kpp_masked(key, x, k_active, max_k: int, n_valid=None):
    """k-means++ over ``max_k`` slots; slots >= ``k_active`` (traced) get a
    far sentinel so the E-step never assigns to them.  One compile serves
    every probed K — on the remote-compile TPU path, recompiling per K would
    dominate the whole search.

    ``n_valid`` (traced): rows >= it are padding — their d2 weight starts
    at 0 so the cumsum draw never selects them (0-weighted rows stay 0
    under the min-update because squared distances are nonnegative)."""
    import jax
    import jax.numpy as jnp

    n, d = x.shape
    nv = n if n_valid is None else n_valid
    sentinel = jnp.full((d,), 1e12, jnp.float32)
    key, sub = jax.random.split(key)
    first = jax.random.randint(sub, (), 0, nv)
    centers = jnp.tile(sentinel[None, :], (max_k, 1)).at[0].set(x[first])
    d2 = jnp.sum((x - x[first]) ** 2, axis=1)
    if n_valid is not None:
        d2 = d2 * (jnp.arange(n) < n_valid)

    def body(i, carry):
        key, centers, d2 = carry
        key, sub = jax.random.split(key)
        active = i < k_active
        prob = d2 / jnp.maximum(d2.sum(), 1e-30)
        idx = jnp.argmax(jnp.cumsum(prob) >= jax.random.uniform(sub, ()))
        new_c = jnp.where(active, x[idx], sentinel)
        centers = centers.at[i].set(new_c)
        d_new = jnp.sum((x - x[idx]) ** 2, axis=1)
        d2 = jnp.where(active, jnp.minimum(d2, d_new), d2)
        return key, centers, d2

    import jax.lax as lax

    _, centers, _ = lax.fori_loop(1, max_k, body, (key, centers, d2))
    return centers



@functools.partial(jax.jit, static_argnames=("max_k", "max_iterations",
                                             "n_init", "fused"))
def _dynk_run(key, x, k_active, max_k, max_iterations, n_init,
              fused: bool = False, n_valid=None):
    """Module-level jitted core: jax.jit caches per function object, so this
    must NOT be redefined per call — one executable serves every probed K.
    ``n_valid`` (traced): rows >= it are mesh-padding, dropped from seeding
    (``_kpp_masked``) and from sums/counts/inertia (``row_w``)."""
    import jax.numpy as jnp

    from scd_tpu.ops.em import em_iteration

    row_w = (None if n_valid is None
             else (jnp.arange(x.shape[0]) < n_valid).astype(jnp.float32))

    def one_restart(sub):
        centers0 = _kpp_masked(sub, x, k_active, max_k, n_valid=n_valid)

        def body(_, carry):
            centers, _labels, _inertia = carry
            # shared fused/XLA dispatch (the far-sentinel clusters of the
            # dynamic-K trick never win the argmin, so semantics carry
            # over unchanged)
            labels, sums, counts, inertia = em_iteration(x, centers, max_k,
                                                         row_w=row_w,
                                                         fused=fused)
            means = sums / jnp.maximum(counts, 1.0)[:, None]
            new_centers = jnp.where((counts > 0)[:, None], means, centers)
            return new_centers, labels, inertia

        init = (centers0, jnp.zeros((x.shape[0],), jnp.int32),
                jnp.float32(0))
        _c, labels, inertia = jax.lax.fori_loop(0, max_iterations, body, init)
        return labels, inertia

    keys = jax.random.split(key, n_init)
    labels, inertias = jax.vmap(one_restart)(keys)
    best = jnp.argmin(inertias)
    return labels[best], inertias[best]


def fit_kmeans_dynamic_k(key, x: np.ndarray, k_active: int, max_k: int,
                         n_init: int = 3, max_iterations: int = 50,
                         fused: bool = None, mesh=None):
    """K-means whose cluster count is a TRACED value: clusters >= k_active
    are far sentinels that never receive points.  Returns (labels [N],
    inertia).  Compiled once per (shape, max_k); every K in
    [2, max_k] reuses the same executable.  ``fused=None``: fused Pallas
    E+M on TPU, XLA ops elsewhere (overridable for tests).

    ``mesh``: shard the rows over the mesh's ``data`` axis (padded for an
    even split; padded rows are masked out of seeding and sums).  Uses the
    auto-partitioning XLA ops — a pallas_call is opaque to GSPMD.

    Multi-controller: ``x`` is THIS PROCESS's row shard; the returned
    labels cover the GLOBAL rows on every host (so the estimate_k
    objective's ``targets``/``mask_lab`` must be the global arrays)."""
    import jax.numpy as jnp

    from scd_tpu.core.multihost import host_fetch
    from scd_tpu.cluster.kmeans import _device_f32, _stage_rows

    if mesh is not None:
        x_j, n = _stage_rows(x, mesh)
        n_valid = jnp.asarray(n)
        fused = False
    else:
        x_j = _device_f32(x)
        n = x_j.shape[0]
        n_valid = None
        if fused is None:
            from scd_tpu.ops.pallas_kernels import fused_em_block_n

            # the kernel pads to max_k lanes regardless of k_active, so the
            # VMEM ceiling is governed by max_k (see fused_em_block_n)
            fused = (jax.default_backend() == "tpu"
                     and fused_em_block_n(x.shape[1], max_k) is not None)

    labels, inertia = _dynk_run(key, x_j, jnp.asarray(int(k_active)), max_k,
                                max_iterations, n_init, fused=bool(fused),
                                n_valid=n_valid)
    return host_fetch(labels)[:n], float(inertia)


def _normalized_device(all_feats):
    """L2-normalized device-resident f32 features, without a host
    round-trip for inputs already on device (``_device_f32``)."""
    import jax.numpy as jnp

    from scd_tpu.cluster.kmeans import _device_f32

    x = _device_f32(all_feats)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                           1e-12)


def labelled_acc_objective_dynamic(all_feats: np.ndarray,
                                   targets: np.ndarray,
                                   mask_lab: np.ndarray, max_k: int,
                                   n_init: int = 3,
                                   max_iterations: int = 50,
                                   seed: int = 0,
                                   mesh=None) -> Callable[[int], float]:
    """Like ``labelled_acc_objective`` but every probe of K reuses ONE
    compiled k-means (dynamic-K) — the right variant for the remote-compile
    TPU path, where per-K recompiles would dominate the search.

    ``mesh``: shard the feature rows over the mesh's ``data`` axis — the
    whole search then runs SPMD (the E-step distance matmul and the
    one-hot M-step segment sums partition by rows; XLA all-reduces the
    per-shard center sums), so a 1M-row search scales across chips with
    no code change to the probes.

    Multi-controller: ``all_feats`` is THIS PROCESS's row shard (evenly
    divisible over the local devices) while ``targets``/``mask_lab`` are
    the GLOBAL arrays on every host — the returned labels cover the
    global rows."""
    import jax

    # normalize AND stage to device ONCE: the search probes the objective
    # ~3+log2(max_k) times, and re-uploading [N, D] per probe (or
    # np.asarray-fetching a device-resident input, CLAUDE.md rule 3)
    # costs seconds per probe through the ~50 MB/s tunnel
    from scd_tpu.core.multihost import is_multiprocess

    if mesh is not None and is_multiprocess():
        # assemble the GLOBAL row-sharded array from this process's shard
        # first — normalizing to a process-local device array would make
        # _stage_rows treat each host's DIFFERENT local rows as the same
        # global value
        from scd_tpu.core.multihost import rows_from_process_local

        staged, _n = rows_from_process_local(
            mesh, np.asarray(all_feats, np.float32))
        all_feats = _normalized_device(staged)
    else:
        all_feats = _normalized_device(all_feats)
    mask_lab = np.asarray(mask_lab, bool)
    targets = np.asarray(targets, np.int64)

    def objective(k: int) -> float:
        # mesh staging per probe is device-side only (pad + re-lay-out of
        # the already-resident array) — nothing crosses the host link
        labels, _inertia = fit_kmeans_dynamic_k(
            jax.random.PRNGKey(seed), all_feats, int(k), max_k,
            n_init=n_init, max_iterations=max_iterations, mesh=mesh)
        return float(cluster_acc(targets[mask_lab], labels[mask_lab]))

    return objective


def labelled_acc_objective(all_feats: np.ndarray, targets: np.ndarray,
                           mask_lab: np.ndarray,
                           n_init: int = 3, max_iterations: int = 50,
                           seed: int = 0) -> Callable[[int], float]:
    """Objective(K) = clustering ACC measured on labelled instances only
    (reference ``test_kmeans``, ``estimate_k.py:41-100``)."""
    all_feats = _normalized_device(all_feats)  # once, not per probe
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
        if acc_middle > best_acc:
            best_k, best_acc = middle_k, acc_middle
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
    # the optimizer only ever evaluated int(res.x) (truncation in the
    # lambda); return that K so the (K, acc) pair is the one measured
    best_k = int(res.x)
    return best_k, float(-res.fun)


def estimate_k(all_feats: np.ndarray, targets: np.ndarray,
               mask_lab: np.ndarray, min_k: int, max_k: int,
               method: str = "binary", verbose: bool = False,
               objective: Optional[Callable[[int], float]] = None,
               dynamic_k: bool = True, mesh=None) -> Tuple[int, float]:
    if objective is not None:
        obj = objective
    elif dynamic_k:
        obj = labelled_acc_objective_dynamic(all_feats, targets, mask_lab,
                                             max_k=max_k, mesh=mesh)
    else:
        obj = labelled_acc_objective(all_feats, targets, mask_lab)
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
