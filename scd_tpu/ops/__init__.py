from scd_tpu.ops.distance import pairwise_sqdist, estep_assign  # noqa: F401
from scd_tpu.ops.segment import segment_mean, mstep_update  # noqa: F401
from scd_tpu.ops.kpp import kmeans_plus_plus  # noqa: F401
from scd_tpu.ops.wta import hash_transform, wta_hash  # noqa: F401
from scd_tpu.ops.assignment import (  # noqa: F401
    auction_assignment,
    contingency_matrix_device,
    linear_assignment_device,
)
