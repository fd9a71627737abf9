"""Small utilities mirrored from the reference's common/myutils.h."""

from .describe import describe

__all__ = ["describe"]
