from skix.vis.skeleton import SkeletonVisualizer  # noqa: F401
from skix.vis.scene import SceneVisualizer  # noqa: F401
from skix.vis.animation import render_animation  # noqa: F401
from skix.vis.render3d import (  # noqa: F401
    BevVideoRenderer, BevView, Open3DBevVideoRenderer, render_frame)
from skix.vis.masklet import (  # noqa: F401
    masklet_outputs_from_session, render_masklet_frame,
    save_masklet_image, save_masklet_video)
