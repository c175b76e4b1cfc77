from rednose_tpu.smoothing.rts import (  # noqa: F401
    rts_smooth,
    rts_smooth_parallel,
    smooth_estimates,
)
