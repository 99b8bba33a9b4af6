from skix.fuse.confidence import (  # noqa: F401
    canonicalize_pose_3d,
    crossview_consistency_confidence,
    fit_weak_perspective,
    weakpersp_reproj_confidence,
)
from skix.fuse.fuse import (  # noqa: F401
    align_right_to_left,
    body_side_bias,
    center_scale_h36m,
    combine_q,
    fuse_pose_no_extrinsics,
    fuse_sequence,
    fuse_two_views,
    median_bone_lengths,
    q_2d_sanity,
    q_from_bone_deviation,
    q_from_temporal,
    softmax2,
)
