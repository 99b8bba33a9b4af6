from skix.models.videopose3d import (  # noqa: F401
    TemporalLifter,
    convert_reference_state_dict,
    infer_sequence,
    receptive_field,
)
