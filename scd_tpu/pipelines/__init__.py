from scd_tpu.pipelines.infer import (  # noqa: F401
    NameClassifier,
    classifier_from_run,
)
