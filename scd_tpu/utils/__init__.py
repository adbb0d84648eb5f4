from scd_tpu.utils.runtime import enable_compilation_cache, block_timed  # noqa: F401
from scd_tpu.utils.experiment import (  # noqa: F401
    AverageMeter,
    IndicatePlateau,
    MetricWriter,
    init_experiment,
    read_scalars,
)
from scd_tpu.utils.logparse import parse_run_log, summarize_runs  # noqa: F401
