from scd_tpu.data.core import (  # noqa: F401
    GCDSplits,
    ImageTable,
    MergedDataset,
    build_gcd_splits,
    subsample_instances,
)
from scd_tpu.data.registry import get_class_splits, get_datasets  # noqa: F401
from scd_tpu.data.transforms import clip_preprocess, get_transform  # noqa: F401
from scd_tpu.data.loader import iterate_batches  # noqa: F401
from scd_tpu.data.augment import (  # noqa: F401
    ContrastiveViewGenerator,
    RandAugment,
    cutout,
)
