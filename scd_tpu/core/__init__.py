from scd_tpu.core.config import (  # noqa: F401
    ClusterConfig,
    DataConfig,
    MeshConfig,
    NamingConfig,
    PipelineConfig,
    config_hash,
)
from scd_tpu.core.mesh import MeshContext, make_mesh  # noqa: F401
from scd_tpu.core.cache import ArtifactCache  # noqa: F401
