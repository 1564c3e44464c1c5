from goconnect_spark.operators.joins import interval_join, salted_join
from goconnect_spark.operators.multimodal import (
    attach_meta,
    extract_features,
    media_repartition,
    parse_media_headers,
    sample_frames,
)
from goconnect_spark.queries.dedup import ngram_jaccard_pairs
from goconnect_spark.queries.similarity import near_dup_pairs

__all__ = [
    "interval_join",
    "salted_join",
    "attach_meta",
    "extract_features",
    "media_repartition",
    "parse_media_headers",
    "sample_frames",
    "ngram_jaccard_pairs",
    "near_dup_pairs",
]
