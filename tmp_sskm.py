import time, numpy as np, jax
from scd_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
from scd_tpu.cluster import fit_sskm
from scd_tpu.core.config import ClusterConfig
rng = np.random.default_rng(0)
k = 100
feat_centers = rng.standard_normal((k, 768)).astype(np.float32) * 3
u_true = rng.integers(0, k, 98304); l_true = rng.integers(0, k // 2, 32768)
u = feat_centers[u_true] + 0.5 * rng.standard_normal((98304, 768)).astype(np.float32)
l = feat_centers[l_true] + 0.5 * rng.standard_normal((32768, 768)).astype(np.float32)
cfg = ClusterConfig(algorithm="SSKM", n_clusters=k, n_init=3, max_iterations=20)
for tag in ("first(incl compile+upload)", "second(jit-cached)"):
    t0 = time.perf_counter()
    res = fit_sskm(jax.random.PRNGKey(0), u, l, l_true, cfg)
    print(f"SSKM {tag}: {time.perf_counter()-t0:.1f}s, n_iter {res.n_iter}")
