from . import aa, vec

__all__ = ["aa", "vec"]
