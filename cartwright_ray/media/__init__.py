from .png import png_decode, png_encode

__all__ = ["png_decode", "png_encode"]
