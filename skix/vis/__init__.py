from skix.vis.skeleton import SkeletonVisualizer  # noqa: F401
from skix.vis.scene import SceneVisualizer  # noqa: F401
from skix.vis.animation import render_animation  # noqa: F401
