from skix.front_side.bev import (  # noqa: F401
    BEVConfig,
    bev_homography,
    draw_bev_skeleton,
    foot_from_bbox_xyxy,
    make_bev_canvas,
    project_world_to_bev,
)
