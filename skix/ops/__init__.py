from skix.ops.attention import flash_attention  # noqa: F401
from skix.ops.nms import batched_nms, nms  # noqa: F401
from skix.ops.connected_components import connected_components  # noqa: F401
from skix.ops.masks import mask_iou, masks_to_boxes  # noqa: F401
