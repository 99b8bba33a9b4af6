from skix.perception.byte_track import (  # noqa: F401
    ByteTrackConfig,
    estimate_global_motion,
    track_sequence_ids,
)
from skix.perception.selection import (  # noqa: F401
    fill_invalid_frames,
    select_person_sequence,
)
