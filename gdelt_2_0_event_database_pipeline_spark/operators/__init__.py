from .sampling import (  # noqa: F401
    sample_daily,
    sample_filtered,
    sample_per_group,
    sample_uniform,
)
