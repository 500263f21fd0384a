from .extract import extract_points, extract_batch
from .encode import encode_cells, encode_batch
from .dedup import (exact_dedup, minhash_lsh_dedup, simhash_dedup,
                    embedding_near_dups)
from .textstats import text_stats, detect_language, fingerprint
from .ann import ann_search, lsh_ann_search
from .media import (media_rows_from_corpus, extract_media_features,
                    MediaFeatureExtractor, MediaResize, FrameSampler)

__all__ = [
    "extract_points", "extract_batch", "encode_cells", "encode_batch",
    "exact_dedup", "minhash_lsh_dedup", "simhash_dedup",
    "embedding_near_dups", "text_stats", "detect_language", "fingerprint",
    "ann_search", "lsh_ann_search", "media_rows_from_corpus",
    "extract_media_features", "MediaFeatureExtractor", "MediaResize",
    "FrameSampler",
]
