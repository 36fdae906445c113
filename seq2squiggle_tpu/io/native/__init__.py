"""Native (C++) codec components, loaded via ctypes with lazy compilation."""

from .build import load_native  # noqa: F401
