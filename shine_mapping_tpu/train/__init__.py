from . import losses, optimizer

__all__ = ["losses", "optimizer"]
