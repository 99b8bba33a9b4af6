from skix.solvers.ba import (  # noqa: F401
    BAConfig,
    BAResult,
    ba_loss_terms,
    bundle_adjust,
)
from skix.solvers.lm import levenberg_marquardt  # noqa: F401
