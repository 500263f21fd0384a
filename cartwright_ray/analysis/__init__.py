from .helpers import get_uniformity, match_unit
from .time_resolution import convert_to_timestamps, detect_temporal_resolution
from .space_resolution import detect_latlon_resolution, preprocess_latlon

__all__ = [
    "get_uniformity", "match_unit", "convert_to_timestamps",
    "detect_temporal_resolution", "detect_latlon_resolution",
    "preprocess_latlon",
]
