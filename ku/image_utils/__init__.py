from ku.image_utils.utility import (
    DEVICE_CPU,
    DEVICE_GPU,
    resize,
    resize_image_to_target_symmeric_size,
    get_one_hot,
    resize_batch,
)
