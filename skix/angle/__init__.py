from skix.angle.biomech import (  # noqa: F401
    ANGLE_DEFS,
    TARGET_IDS,
    UNITY_MHR70_MAPPING,
    compute_all_series,
    compute_angles,
    compute_elbow_distance,
    compute_facing_heading,
    compute_knee_difference,
    compute_tilt_angles,
    compute_torso_knee_angle,
    detect_turn_segments,
    joint_angle_deg,
)
