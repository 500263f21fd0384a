from .png import png_decode, png_encode
from .wav import wav_decode, wav_encode

__all__ = ["png_decode", "png_encode", "wav_decode", "wav_encode"]
