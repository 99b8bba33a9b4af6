from skix.perception.selection import (  # noqa: F401
    fill_invalid_frames,
    select_person_sequence,
)
