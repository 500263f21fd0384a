from .flagship import flagship_pipeline, extracted_points, encoded_points

__all__ = ["flagship_pipeline", "extracted_points", "encoded_points"]
