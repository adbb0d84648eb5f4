from scd_tpu.utils.runtime import enable_compilation_cache, block_timed  # noqa: F401
