from africanus_tpu.testing.beam_factory import beam_factory

__all__ = ["beam_factory"]
