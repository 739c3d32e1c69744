from . import codecs, golden

__all__ = ["codecs", "golden"]
