from scd_tpu.train.losses import (  # noqa: F401
    info_nce_loss,
    label_smoothing_ce,
    nt_xent_loss,
    supcon_loss,
)
from scd_tpu.train.gcd import DINOHead, GCDTrainer, make_gcd_state  # noqa: F401
from scd_tpu.train.schedulers import (  # noqa: F401
    cosine_warmup_schedule,
    get_scheduler,
    linear_rampup,
    sigmoid_rampup,
)
from scd_tpu.train.checkpoint import CheckpointManager, strip_key_prefix  # noqa: F401
from scd_tpu.train.baselines_e2e import (  # noqa: F401
    train_autonovel_e2e,
    train_uno_e2e,
)
