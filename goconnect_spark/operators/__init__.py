from goconnect_spark.operators.joins import salted_join
from goconnect_spark.operators.multimodal import (
    attach_meta,
    extract_features,
    media_repartition,
    sample_frames,
)

__all__ = [
    "salted_join",
    "attach_meta",
    "extract_features",
    "media_repartition",
    "sample_frames",
]
