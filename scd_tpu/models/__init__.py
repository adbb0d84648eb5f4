from scd_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    VisionTransformerWithLinear,
    ViTConfig,
)
from scd_tpu.models.resnet import ResNetTwoHead  # noqa: F401
from scd_tpu.models.clip import (  # noqa: F401
    CLIPConfig,
    CLIPModel,
    clip_vit_b16_config,
    load_openai_clip_weights,
)
from scd_tpu.models.dino import dino_vit_b16_config, load_dino_weights  # noqa: F401
from scd_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer  # noqa: F401
