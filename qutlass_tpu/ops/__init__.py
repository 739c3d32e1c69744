from . import dispatch, emulation

__all__ = ["dispatch", "emulation"]
