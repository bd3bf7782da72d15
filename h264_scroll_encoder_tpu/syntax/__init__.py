from . import params, slice_headers, parse, nal  # noqa: F401
