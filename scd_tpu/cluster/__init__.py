from scd_tpu.cluster.kmeans import KMeansResult, fit_kmeans, fit_sskm  # noqa: F401
