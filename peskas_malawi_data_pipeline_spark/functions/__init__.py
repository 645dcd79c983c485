from . import expressions, text

__all__ = ["expressions", "text"]
