"""Host-side training-data layer: COCO-format datasets, augmentations,
and fixed-shape collation feeding the TPU train steps."""

from skix.data.coco import (CocoDataset, CocoLoader, collate_fixed,
                            hflip_record, random_resize_crop, resize_pad_to)

__all__ = ["CocoDataset", "CocoLoader", "collate_fixed", "hflip_record",
           "random_resize_crop", "resize_pad_to"]
