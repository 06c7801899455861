from .columns import (  # noqa: F401
    IMAGE_SCHEMA,
    attach_binary_metadata,
    decode_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
