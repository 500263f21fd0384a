from .schemas import (
    Category, Subcategory, Matchtype, Parser, FuzzyCategory, Uniformity,
    AngleUnit, TimeUnit, Resolution, GeoSpatialResolution, Classification,
)
from .registry import REGISTRY, all_labels
from .cascade import classify_series, classify_table, classify_dataset

__all__ = [
    "Category", "Subcategory", "Matchtype", "Parser", "FuzzyCategory",
    "Uniformity", "AngleUnit", "TimeUnit", "Resolution",
    "GeoSpatialResolution", "Classification", "REGISTRY", "all_labels",
    "classify_series", "classify_table", "classify_dataset",
]
