from scd_tpu.cluster.kmeans import (  # noqa: F401
    KMeansResult,
    fit_kmeans,
    fit_kmeans_from_labels,
    fit_sskm,
)
from scd_tpu.cluster.constrained import (  # noqa: F401
    fit_constrained,
    fit_constrained_unsup,
)
from scd_tpu.cluster.finch import finch, finch_fit  # noqa: F401
from scd_tpu.cluster.estimate_k import estimate_k  # noqa: F401
from scd_tpu.cluster.runners import (  # noqa: F401
    collate_features,
    eval_kmeans,
    eval_kmeans_optimal,
    eval_kmeans_semi_sup,
    eval_kmeans_semi_sup_stratified,
    load_ssb_difficulty_splits,
    stratified_accs,
)
