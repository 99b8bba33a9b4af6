"""Host-side training-data layer: COCO-format datasets, augmentations,
and fixed-shape collation feeding the TPU train steps."""

from skix.data.coco import (CocoDataset, CocoLoader, collate_fixed,
                            color_jitter_record, grayscale_record,
                            hflip_record, mosaic_record,
                            motion_blur_record, random_resize_crop,
                            resize_pad_to)
from skix.data.video import (VideoDataset, collate_clips,
                             sample_clip_frames, tile_image_clip)
from skix.data.grounding import (Datapoint, FindQuery,
                                 FlexibleFilterFindGetQueries,
                                 GroundingImage, GroundingObject,
                                 datapoint_from_coco)

__all__ = ["CocoDataset", "CocoLoader", "collate_fixed",
           "color_jitter_record", "grayscale_record", "hflip_record",
           "mosaic_record", "motion_blur_record", "random_resize_crop",
           "resize_pad_to", "VideoDataset", "collate_clips",
           "sample_clip_frames", "tile_image_clip",
           "Datapoint", "FindQuery", "FlexibleFilterFindGetQueries",
           "GroundingImage", "GroundingObject", "datapoint_from_coco"]
