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
from scd_tpu.models.dino import (  # noqa: F401
    dino_vit_b16_config,
    dino_vit_s16_config,
    dino_vit_t16_config,
    load_dino_weights,
)
from scd_tpu.models.resnet50 import (  # noqa: F401
    ResNet50,
    ResNet50Config,
    load_resnet50_weights,
)
from scd_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer  # noqa: F401
