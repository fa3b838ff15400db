from . import morton, interp, hashgrid, query

__all__ = ["morton", "interp", "hashgrid", "query"]
