from . import expgolomb, bitpack, ebsp, bitio  # noqa: F401
