from skix.vis.skeleton import SkeletonVisualizer  # noqa: F401
from skix.vis.scene import SceneVisualizer  # noqa: F401
from skix.vis.animation import render_animation  # noqa: F401
from skix.vis.render3d import (  # noqa: F401
    BevVideoRenderer, BevView, Open3DBevVideoRenderer, render_frame)
