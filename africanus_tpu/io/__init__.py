from africanus_tpu.io.ms_store import MSStore

__all__ = ["MSStore"]
