from .checkpoint import checkpointed_write, read_manifest

__all__ = ["checkpointed_write", "read_manifest"]
