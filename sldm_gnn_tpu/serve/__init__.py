"""Online serving: FIFO JSON streaming inference."""

from .stream import StreamingServer, InferenceEngine  # noqa: F401
