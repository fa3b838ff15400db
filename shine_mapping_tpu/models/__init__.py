from . import decoder

__all__ = ["decoder"]
