import numpy as np, jax
from sklearn.datasets import make_blobs
from scd_tpu import ClusterConfig
from scd_tpu.cluster import fit_sskm
from scd_tpu.metrics import evaluate_clustering
from scd_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()
X, y = make_blobs(n_samples=4096, n_features=768, centers=20, random_state=3)
X = X.astype(np.float32)
lab = np.zeros(len(y), bool); lab[:1024] = True
res = fit_sskm(jax.random.PRNGKey(1), X[~lab], X[lab], y[lab],
               ClusterConfig(n_clusters=20, n_init=2, max_iterations=20))
yy = np.concatenate([y[lab], y[~lab]])
m = evaluate_clustering(yy, np.asarray(res.labels))
print("sskm on-chip:", m)
assert m["acc"] > 0.95, m
print("VERIFY OK")
