from . import ipcm, scroll, rewrite  # noqa: F401
