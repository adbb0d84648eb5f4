from scd_tpu.metrics.cluster import (  # noqa: F401
    cluster_acc,
    contingency_matrix,
    evaluate_clustering,
    log_accs_from_preds,
    purity_score,
    topk_accuracy,
    split_cluster_acc_v1,
    split_cluster_acc_v2,
    split_cluster_acc_v3,
)
from scd_tpu.metrics.semantic import (  # noqa: F401
    evaluate_semantic_acc,
    evaluate_soft_semantic_acc,
    name_set_iou,
)
