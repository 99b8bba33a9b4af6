"""skix.geometry — pure-jnp geometry core.

One library serving triangulation, fusion, bundle adjustment, metrics and
angle computation. The reference implements these primitives 4+ times in
separate stages (SURVEY.md §2.2/§2.3/§2.5/§2.10); here they are shared,
batched (vmap-first), mask-based (no NaN control flow), and jit-safe.
"""

from skix.geometry import skeletons  # noqa: F401
from skix.geometry.camera import (  # noqa: F401
    camera_to_world,
    image_coordinates,
    normalize_screen_coordinates,
    project_linear,
    project_points,
    project_to_2d_h36m,
    world_to_camera,
)
from skix.geometry.epipolar import (  # noqa: F401
    estimate_relative_pose,
    recover_pose,
    sampson_distance,
    scale_translation_to_baseline,
)
from skix.geometry.rigid import (  # noqa: F401
    kabsch,
    rigid_validity,
    umeyama,
)
from skix.geometry.rotations import (  # noqa: F401
    matrix_to_rotvec,
    qinverse,
    qrot,
    rot6d_to_matrix,
    rotvec_to_matrix,
)
from skix.geometry.smoothing import (  # noqa: F401
    adaptive_ema,
    ema,
    moving_average,
    savgol_smooth,
)
from skix.geometry.triangulate import (  # noqa: F401
    projection_matrix,
    triangulate_dlt,
    triangulate_sequence,
)
