from africanus_tpu.model.spectral.spec_model import spectral_model

__all__ = ["spectral_model"]
