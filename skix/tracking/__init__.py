from skix.tracking.lifecycle import (  # noqa: F401
    TrackerConfig,
    TrackerState,
    init_tracker_state,
    track_sequence,
    tracker_step,
)
from skix.tracking.detector import DetrDetector  # noqa: F401
from skix.tracking.masklet import (  # noqa: F401
    MaskletConfig,
    MaskletState,
    MaskletVideoModel,
    init_masklet_state,
    masklet_update,
    track_masklets,
)
from skix.tracking.session import VideoPredictor  # noqa: F401
from skix.tracking.memory_tracker import (  # noqa: F401
    MaskMemoryTracker,
    propagate_object,
    propagate_objects,
)
from skix.tracking.postprocess import postprocess_detections  # noqa: F401
from skix.tracking.sam_prompt_encoder import (  # noqa: F401
    InteractiveSegmenter,
    SamImagePredictor,
    SamPromptEncoder,
)
