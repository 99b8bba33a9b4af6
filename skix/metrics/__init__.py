from skix.metrics.losses import (  # noqa: F401
    mean_velocity_error,
    mpjpe,
    n_mpjpe,
    p_mpjpe,
    weighted_mpjpe,
)
