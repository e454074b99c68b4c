from scalpel_ts_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_SCHEMA,
    attach_media_blob,
    decode_image,
    frame_sample,
    media_features,
)
