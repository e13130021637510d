from africanus_tpu.model.coherency.conversion import convert, convert_ri

__all__ = ["convert", "convert_ri"]
