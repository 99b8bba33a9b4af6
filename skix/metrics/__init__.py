from skix.metrics.losses import (  # noqa: F401
    mean_velocity_error,
    mpjpe,
    n_mpjpe,
    p_mpjpe,
    weighted_mpjpe,
)

__all__ = [
    "mean_velocity_error", "mpjpe", "n_mpjpe", "p_mpjpe", "weighted_mpjpe",
    # evaluators live in submodules (import lazily — they pull scipy):
    # skix.metrics.tracking_eval (MOTA/HOTA/YTVIS), skix.metrics.teta,
    # skix.metrics.cgf1, skix.metrics.suite, skix.metrics.detection_eval,
    # skix.metrics.evaluation
]
